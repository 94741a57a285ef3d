"""Command-line solver driver.

The executable front-end analogue of the reference AMPL driver
(bindings/ampl/ampl_main.c: read a problem file, apply keyword settings,
solve, write the solution).  Problems are Python modules exposing either
``problem, x0 = make()`` or module-level ``problem``/``x0``; settings come
from ``key = value`` files (settings.c:743-800 reader) or ``--set k=v``.

    python -m sleqp_tpu PROBLEM.py [--settings FILE] [--set k=v ...]
                         [--max-iterations N] [--time-limit S] [-v]
    python -m sleqp_tpu --hs hs71            # built-in suite problem
    python -m sleqp_tpu --suite              # full HS sweep, CSV output
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import logging
import sys


def _load_problem(path: str):
    spec = importlib.util.spec_from_file_location("user_problem", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if hasattr(module, "make"):
        return module.make()
    return module.problem, module.x0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="sleqp_tpu", description=__doc__)
    parser.add_argument("problem", nargs="?", help="python problem file")
    parser.add_argument("--hs", help="built-in HS problem name (e.g. hs71)")
    parser.add_argument(
        "--suite", action="store_true", help="run the full HS sweep (CSV)"
    )
    parser.add_argument(
        "--suite-set",
        choices=("hs", "medium", "large", "all"),
        default="hs",
        help="which problem set --suite runs: the 59 HS problems "
        "(default), the medium-scale (n ~ 100-1000) set, the large "
        "banded set (n >= 10^4, structured path), or everything",
    )
    parser.add_argument("--settings", help="key = value settings file")
    parser.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="K=V",
        help="override one setting",
    )
    parser.add_argument("--max-iterations", type=int, default=1000)
    parser.add_argument("--time-limit", type=float, default=None)
    parser.add_argument("--json", action="store_true", help="JSON output")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    if args.verbose:
        logging.basicConfig(level=logging.INFO, format="%(message)s")
        logging.getLogger("sleqp_tpu").setLevel(logging.INFO)

    # honor an explicit JAX_PLATFORMS even when the environment's
    # sitecustomize forced a different backend (e.g. a TPU tunnel)
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from .settings import Settings, read_settings_file, read_settings_string

    # settings stays None unless the user configured any — run_problem
    # applies its per-problem option table only for default settings
    settings = None
    if args.settings or args.set:
        settings = Settings()
        if args.settings:
            settings = read_settings_file(args.settings, settings)
        if args.set:
            settings = read_settings_string("\n".join(args.set), settings)

    if args.suite:
        from .harness import CSV_HEADER, run_suite

        names = None
        if args.suite_set != "hs":
            from .harness.driver import ALL_PROBLEMS
            from .harness.large import LARGE_PROBLEMS
            from .harness.medium import MEDIUM_PROBLEMS

            names = {
                "medium": MEDIUM_PROBLEMS,
                "large": LARGE_PROBLEMS,
                "all": ALL_PROBLEMS,
            }[args.suite_set]
        print(CSV_HEADER)
        result = run_suite(
            names,
            settings=settings,
            max_iterations=args.max_iterations,
            verbose=True,
        )
        print(
            f"# solved {result.solved}/{result.total} "
            f"({100.0 * result.solved_fraction:.1f}%)"
        )
        return 0 if result.solved == result.total else 1

    if args.hs:
        from .harness.driver import get_problem

        problem, x0, _ = get_problem(args.hs)
    elif args.problem:
        problem, x0 = _load_problem(args.problem)
    else:
        parser.error("provide a problem file, --hs NAME, or --suite")

    from .solver import Solver
    from .types import Status

    solver = Solver(problem, x0, settings)
    status = solver.solve(
        max_iterations=args.max_iterations, time_limit=args.time_limit
    )

    feas, slack, stat = solver.residuals()
    if args.json:
        print(
            json.dumps(
                {
                    "status": status.name,
                    "objective": solver.obj_val,
                    "x": solver.solution.tolist(),
                    "cons_dual": solver.cons_dual.tolist(),
                    "vars_dual": solver.vars_dual.tolist(),
                    "iterations": solver.iterations,
                    "feas_res": feas,
                    "slack_res": slack,
                    "stat_res": stat,
                    "seconds": solver.elapsed_seconds,
                }
            )
        )
    else:
        print(f"Status     : {status.name}")
        print(f"Objective  : {solver.obj_val:.10e}")
        print(f"Solution   : {solver.solution}")
        print(f"Iterations : {solver.iterations}")
        print(
            f"Residuals  : feas {feas:.3e}  slack {slack:.3e}  stat {stat:.3e}"
        )
        print(f"Elapsed    : {solver.elapsed_seconds:.3f} s")
    return 0 if status == Status.OPTIMAL else 1


if __name__ == "__main__":
    sys.exit(main())
