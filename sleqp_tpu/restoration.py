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
