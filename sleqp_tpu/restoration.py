"""Restoration phase: minimize constraint violation as a box-constrained LSQ.

TPU-native equivalent of src/main/restoration.c: the restoration problem
over (x, s) minimizes ``0.5 * ||c(x) - s||^2`` with s bounded by the
constraint bounds and x by the variable bounds (restoration.c:149,353-440).
It is an unconstrained-except-box LSQ problem solved with the same SQP
machinery (Gauss-Newton Hessian via LSQFunc).

Phase transforms mirror solver/phase.c:194: entering restoration maps the
optimization iterate x to (x, clip(c(x), cons bounds)); leaving takes the
x block back.

Termination when feasible: the reference aborts the restoration solve from
a callback once the original iterate becomes feasible
(solver/solve.c:214-231).  Here the same effect comes from the solver's
unboundedness test: with ``obj_lower = 0.5 * feas_tol^2`` the restoration
solve stops (status UNBOUNDED) as soon as the residual objective
guarantees max violation <= feas_tol, since |c_i - s_i| bounds the
violation when s is inside the constraint bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .problem import LSQFunc, Problem
from .settings import Settings
from .types import Status

Array = jax.Array


def make_restoration_problem(problem: Problem) -> Problem:
    """Build the (x, s) restoration problem (restoration.c:353-440)."""
    n = problem.num_variables
    m = problem.num_cons
    assert m > 0, "restoration requires constraints"

    def residuals(z: Array) -> Array:
        x = z[:n]
        s = z[n:]
        return problem.cons_val(x) - s

    func = LSQFunc(
        residuals,
        num_variables=n + m,
        num_residuals=m,
    )
    var_lb = jnp.concatenate([problem.data.var_lb, problem.data.cons_lb])
    var_ub = jnp.concatenate([problem.data.var_ub, problem.data.cons_ub])
    return Problem(func, var_lb=var_lb, var_ub=var_ub, dtype=problem.dtype)


def restoration_initial_point(problem: Problem, x: Array) -> Array:
    """Optimization -> restoration transform (solver/phase.c)."""
    c = problem.cons_val(x)
    s = jnp.clip(c, problem.data.cons_lb, problem.data.cons_ub)
    return jnp.concatenate([x, s])


def restoration_settings(settings: Settings) -> Settings:
    """Settings for the restoration solve: stop once feasible-enough.

    obj <= 0.5 * feas_tol^2 implies max |c_i - s_i| <= feas_tol which
    bounds the original violation (s lies inside the cons bounds).
    """
    return settings.replace(
        obj_lower=0.5 * settings.feas_tol * settings.feas_tol,
        enable_restoration_phase=False,
        perform_soc=False,
    )


def restoration_succeeded(status: int) -> bool:
    """UNBOUNDED = hit the residual target = feasible for the original."""
    return status in (Status.UNBOUNDED, Status.OPTIMAL)


def solve_with_restoration(
    problem: Problem,
    settings: Settings,
    state0,
    max_iterations: int,
    rest_problem: Problem | None = None,
    max_restoration_iterations: int | None = None,
):
    """Full solve with one in-graph restoration attempt.

    Pure-function equivalent of the host-side phase toggling
    (solver/solve.c:195-238): solve, and when the LP declares local
    infeasibility, run the restoration LSQ solve *inside the same XLA
    program*, transform the iterate back (keeping duals/working
    set/radii/penalty per solver/phase.c:97-147), and resume.  Everything
    sits under ``lax.cond``, so a feasible solve pays nothing at runtime;
    under ``vmap`` the restoration while_loops are status-masked and
    collapse to zero trips when no lane in the batch is infeasible.

    This is how batched/sharded solves (parallel/batch.py) survive
    LOCALLY_INFEASIBLE lanes — the host-side restoration in
    ``Solver.solve`` is unavailable inside one compiled program.
    """
    import dataclasses

    from jax import lax

    from .iterate import create_iterate, max_violation
    from .problem_solver import initial_state, solve_jit

    if rest_problem is None:
        rest_problem = make_restoration_problem(problem)
    rest_settings = restoration_settings(settings)
    if max_restoration_iterations is None:
        max_restoration_iterations = max_iterations
    n = problem.num_variables

    out = solve_jit(problem, settings, state0, max_iterations)

    def attempt(out):
        z0 = restoration_initial_point(problem, out.it.x)
        rs0 = initial_state(rest_problem, rest_settings, z0)
        rest = solve_jit(
            rest_problem, rest_settings, rs0, max_restoration_iterations
        )
        x_restored = rest.it.x[:n]
        viol = max_violation(
            problem.data, problem.cons_val(x_restored)
        )
        recovered = viol <= settings.feas_tol * 10.0

        new_it = create_iterate(problem, x_restored)
        new_it = dataclasses.replace(
            new_it,
            cons_dual=out.it.cons_dual,
            vars_dual=out.it.vars_dual,
            var_states=out.it.var_states,
            cons_states=out.it.cons_states,
        )
        resumed0 = dataclasses.replace(
            out,
            it=new_it,
            status=jnp.asarray(
                jnp.where(recovered, Status.RUNNING, out.status), jnp.int32
            ),
        )
        resumed = solve_jit(problem, settings, resumed0, max_iterations)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(recovered, a, b), resumed, out
        )

    return lax.cond(
        out.status == jnp.asarray(Status.INFEASIBLE, jnp.int32),
        attempt,
        lambda o: o,
        out,
    )
