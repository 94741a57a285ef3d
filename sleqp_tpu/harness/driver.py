"""Suite driver emitting the reference CUTEst CSV schema.

Mirrors src/test/cutest/sleqp_cutest_driver.c:104-121: one CSV line per
problem:

    name;nvars;ncons;status;obj;feas_res;slack_res;stat_res;iterations;
    seconds;boundary_step;trust_radius;min_rayleigh;max_rayleigh

plus solved-% accounting at the reference default tolerances.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, Optional

import numpy as np

from ..settings import Settings
from ..solver import Solver
from ..types import Status
from .hs import HS_PROBLEMS
from .hs import get_problem as _get_hs
from .large import LARGE_PROBLEMS
from .large import get_problem as _get_large
from .medium import MEDIUM_PROBLEMS
from .medium import get_problem as _get_medium


def get_problem(name: str):
    """Look up a suite problem across the HS, medium and large registries."""
    for lookup in (_get_hs, _get_medium, _get_large):
        try:
            return lookup(name)
        except KeyError:
            pass
    raise KeyError(name)


ALL_PROBLEMS = list(HS_PROBLEMS) + list(MEDIUM_PROBLEMS) + list(LARGE_PROBLEMS)

CSV_HEADER = (
    "name;nvars;ncons;status;obj;feas_res;slack_res;stat_res;iterations;"
    "seconds;boundary_step;trust_radius;min_rayleigh;max_rayleigh"
)

# Per-problem solver options (the reference CUTEst driver reads
# per-problem option files, sleqp_cutest_main.c:29-66; these entries are
# the same idea inline).  hs62's objective is scaled by ~3e4 so the
# absolute stationarity tolerance needs nominal-derived scaling;
# hs111's working-set extraction needs the simplex LP's exact basis
# (the vertex-enumeration backend's first-order extraction cycles).
_PROBLEM_OPTIONS: dict = {
    "hs62": {"scaling": "auto"},
    "hs111": {"lp_solver": "SIMPLEX"},
}


_STATUS_NAMES = {
    Status.OPTIMAL: "optimal",
    Status.INFEASIBLE: "infeasible",
    Status.UNBOUNDED: "unbounded",
    Status.ABORT_ITER: "iter_limit",
    Status.ABORT_TIME: "time_limit",
    Status.ABORT_DEADPOINT: "deadpoint",
    Status.ABORT_MANUAL: "aborted",
    Status.UNKNOWN: "unknown",
}


@dataclasses.dataclass
class SuiteResult:
    rows: list[str]
    solved: int
    total: int
    wrong_objective: list[str]

    @property
    def solved_fraction(self) -> float:
        return self.solved / max(self.total, 1)


def _banded_slack_res(problem, st) -> float:
    """Measured complementarity residual max |slack * lam| at the final
    state (iterate.c:241 analogue).  The delta-form update can leave
    nonzero duals on rows that have since left the working set, so the
    residual is NOT structurally zero and must be measured."""
    import jax.numpy as jnp

    C = problem.cons(st.X)
    lo_fin = jnp.isfinite(problem.cons_lb)
    up_fin = jnp.isfinite(problem.cons_ub)
    dist_lo = jnp.where(lo_fin, jnp.abs(C - problem.cons_lb), jnp.inf)
    dist_up = jnp.where(up_fin, jnp.abs(problem.cons_ub - C), jnp.inf)
    slack = jnp.minimum(dist_lo, dist_up)
    # rows with no finite bound must carry zero dual; count |lam| itself
    slack = jnp.where(lo_fin | up_fin, slack, 1.0)
    return float(jnp.max(jnp.abs(slack * st.lam), initial=0.0))


def _run_banded_problem(
    name: str,
    problem,
    x0,
    f_opt,
    settings: Optional[Settings],
    max_iterations: int,
    time_limit: Optional[float] = None,
) -> tuple[str, bool, bool]:
    """Large banded entries (harness/large.py) solve through the
    structured path (banded.py) but emit the SAME CSV schema; the
    trust-radius column carries the Levenberg regularization (the
    structured analogue) and the Rayleigh columns are zero (no Krylov
    loop on this path)."""
    from ..banded import banded_solve

    if time_limit is not None:
        raise ValueError(
            "time_limit is not supported for banded suite entries: the "
            "structured solve runs as one jitted while_loop (no host "
            "checkpoints to test the clock at); bound work with "
            "max_iterations instead"
        )
    settings = settings or Settings()
    start = time.perf_counter()
    st = banded_solve(
        problem, settings, X0=x0, max_iterations=max_iterations
    )
    import jax

    jax.block_until_ready(st.X)
    seconds = time.perf_counter() - start
    status = Status(int(st.status))
    row = ";".join(
        [
            name,
            str(problem.n),
            str(problem.m),
            _STATUS_NAMES.get(status, "unknown"),
            f"{float(st.obj_val):.10e}",
            f"{float(st.feas_res):.6e}",
            f"{_banded_slack_res(problem, st):.6e}",
            f"{float(st.stat_res):.6e}",
            str(int(st.iteration)),
            f"{seconds:.3f}",
            "false",
            f"{float(st.reg):.6e}",
            f"{0.0:.6e}",
            f"{0.0:.6e}",
        ]
    )
    solved = status == Status.OPTIMAL
    obj_ok = True
    if solved and f_opt is not None:
        obj_ok = abs(float(st.obj_val) - f_opt) <= 1e-4 * (1.0 + abs(f_opt))
    return row, solved, obj_ok


def run_problem(
    name: str,
    settings: Optional[Settings] = None,
    max_iterations: int = 3000,
    time_limit: Optional[float] = None,
) -> tuple[str, bool, bool]:
    """Solve one problem; returns (csv_row, solved, objective_matches).

    The iteration cap mirrors the reference default (no iteration limit,
    solver.c SLEQP_NONE; bounded here so iter_limit rows terminate)."""
    from ..banded import BandedProblem

    problem, x0, f_opt = get_problem(name)
    if isinstance(problem, BandedProblem):
        return _run_banded_problem(
            name, problem, x0, f_opt, settings, max_iterations,
            time_limit=time_limit,
        )
    opts = dict(_PROBLEM_OPTIONS.get(name, {}))
    scaling = opts.pop("scaling", None)
    if "lp_solver" in opts:
        from ..types import LPSolver

        base = settings if settings is not None else Settings()
        settings = base.replace(lp_solver=LPSolver[opts["lp_solver"]])
    solver = Solver(problem, x0, settings, scaling=scaling)
    start = time.perf_counter()
    status = solver.solve(max_iterations=max_iterations, time_limit=time_limit)
    seconds = time.perf_counter() - start

    s = solver.state
    feas, slack, stat = solver.residuals()
    row = ";".join(
        [
            name,
            str(problem.num_variables),
            str(problem.num_cons),
            _STATUS_NAMES.get(status, "unknown"),
            f"{solver.obj_val:.10e}",
            f"{feas:.6e}",
            f"{slack:.6e}",
            f"{stat:.6e}",
            str(solver.iterations),
            f"{seconds:.3f}",
            str(bool(s.boundary_step)).lower(),
            f"{float(s.trust_radius):.6e}",
            f"{float(s.min_rayleigh):.6e}",
            f"{float(s.max_rayleigh):.6e}",
        ]
    )
    solved = status == Status.OPTIMAL
    obj_ok = True
    if solved and f_opt is not None:
        obj_ok = abs(solver.obj_val - f_opt) <= 1e-4 * (1.0 + abs(f_opt))
    return row, solved, obj_ok


def run_suite(
    names: Optional[Iterable[str]] = None,
    settings: Optional[Settings] = None,
    max_iterations: int = 3000,
    verbose: bool = False,
) -> SuiteResult:
    import jax

    names = list(names) if names is not None else list(HS_PROBLEMS)
    rows = []
    solved = 0
    wrong = []
    for name in names:
        row, ok, obj_ok = run_problem(name, settings, max_iterations)
        rows.append(row)
        if verbose:
            print(row, flush=True)
        if ok and obj_ok:
            solved += 1
        elif ok and not obj_ok:
            wrong.append(name)
        # each problem compiles unique shapes; dropping the executables
        # bounds compile-memory growth (LLVM OOM/segfault after ~100+
        # in-process compilations otherwise — see CLAUDE.md)
        jax.clear_caches()
    return SuiteResult(
        rows=rows, solved=solved, total=len(names), wrong_objective=wrong
    )


if __name__ == "__main__":
    print(CSV_HEADER)
    result = run_suite(verbose=True)
    print(
        f"# solved {result.solved}/{result.total} "
        f"({100.0 * result.solved_fraction:.1f}%), "
        f"wrong objective: {result.wrong_objective}"
    )
