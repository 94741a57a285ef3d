"""Per-phase performance profile of one SQP iteration.

The reference rolls hierarchical wall-clock timers into its final stats
banner — func evals, factorization vs substitution, LP, EQP, linesearch
(SURVEY.md §5.1; solver/print.c:10-90, func.c:25-32,
standard_aug_jac.c:26-27).  Inside one fused XLA program those phases
cannot be timed individually, so this module jits and times each
component *separately* at a given iterate — the moral equivalent of the
reference's per-phase rollup, used to find the hot phase of a problem
class.  For full-fidelity tracing use `jax.profiler.trace` around a
solve and inspect with xprof/perfetto.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from .cauchy import empty_basis, solve_box_cauchy, solve_cauchy_lp
from .iterate import create_iterate
from .newton import compute_newton_step, compute_working_step
from .ops.kkt import aug_jac_create, solve_lsq
from .problem import Problem
from .problem_solver import initial_state, perform_iteration
from .settings import Settings


def _time(fn, *args, reps: int = 5) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def profile_iteration(
    problem: Problem,
    x0,
    settings: Optional[Settings] = None,
    reps: int = 5,
) -> dict[str, float]:
    """Seconds per phase at the initial iterate (jitted separately)."""
    settings = settings or Settings()
    state = initial_state(problem, settings, jnp.asarray(x0, problem.dtype))
    it = state.it
    data = problem.data
    m = problem.num_cons

    results: dict[str, float] = {}

    results["func_eval(all)"] = _time(
        jax.jit(lambda x: problem.eval_all(x)), it.x, reps=reps
    )

    if m > 0:
        results["cauchy_lp"] = _time(
            jax.jit(
                lambda i, r, p: solve_cauchy_lp(
                    data, i, r, p, empty_basis(problem.num_variables, m)
                )
            ),
            it,
            state.lp_trust_radius,
            state.penalty,
            reps=reps,
        )
        cres = solve_cauchy_lp(
            data, it, state.lp_trust_radius, state.penalty,
            empty_basis(problem.num_variables, m),
        )
        var_states, cons_states = cres.var_states, cres.cons_states
    else:
        cres = solve_box_cauchy(data, it, state.lp_trust_radius)
        var_states, cons_states = cres.var_states, cres.cons_states

    results["kkt_factorization"] = _time(
        jax.jit(lambda J, vs, cs: aug_jac_create(J, vs, cs)),
        it.cons_jac,
        var_states,
        cons_states,
        reps=reps,
    )
    aug_jac = aug_jac_create(it.cons_jac, var_states, cons_states)
    results["kkt_substitution"] = _time(
        jax.jit(lambda aj, g: solve_lsq(aj, g)), aug_jac, -it.obj_grad, reps=reps
    )

    import dataclasses

    it_ws = dataclasses.replace(
        it, var_states=var_states, cons_states=cons_states
    )
    results["working_step"] = _time(
        jax.jit(
            lambda i, aj, tr: compute_working_step(data, i, aj, tr)
        ),
        it_ws,
        aug_jac,
        state.trust_radius,
        reps=reps,
    )
    ws = compute_working_step(data, it_ws, aug_jac, state.trust_radius)

    def eqp(i, aj, w, pen):
        return compute_newton_step(
            data,
            i,
            aj,
            w,
            lambda d: problem.hess_prod(i.x, d, i.cons_dual),
            pen,
            settings.max_newton_iterations,
            use_gltr=not problem.func.psd_hessian,
        )

    results["eqp_solve"] = _time(
        jax.jit(eqp), it_ws, aug_jac, ws, state.penalty, reps=reps
    )

    results["full_iteration"] = _time(
        jax.jit(lambda s: perform_iteration(problem, settings, s)),
        state,
        reps=reps,
    )
    return results


def print_profile(results: dict[str, float]) -> None:
    total = results.get("full_iteration", 0.0)
    for name, seconds in results.items():
        pct = 100.0 * seconds / total if total else 0.0
        print(f"{name:20s} {1e3 * seconds:10.3f} ms  ({pct:5.1f}% of iter)")
