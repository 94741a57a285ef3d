"""Iterate pytree and KKT residuals.

TPU-native equivalent of the reference ``SleqpIterate`` (src/main/iterate.c)
and the feasibility helpers (src/main/feas.c).  The working set lives inside
the iterate as two fixed-shape int8 state arrays instead of the reference's
dynamically-sized ``SleqpWorkingSet`` container (src/main/working_set.c):
fixed shapes keep the whole SQP step jit-compilable.

Dual sign conventions follow the reference exactly (iterate.c:241-517):
  * stationarity residual r = ∇f + J^T cons_dual + vars_dual  (max-abs norm)
  * duals at upper bounds are >= 0, at lower bounds <= 0
  * slackness residual per entry: d >= 0 -> max(ub - v, 0) * d,
    d < 0 -> max(v - lb, 0) * d   (iterate.c:318-325)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .problem import Problem, ProblemData
from .types import ActiveState

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Iterate:
    """Primal/dual point with cached evaluations (pub_iterate.h:14-50)."""

    x: Array  # (n,) primal
    obj_val: Array  # scalar f(x)
    obj_grad: Array  # (n,) ∇f(x)
    cons_val: Array  # (m,) c(x)
    cons_jac: Array  # (m, n) J_c(x)
    cons_dual: Array  # (m,) constraint duals
    vars_dual: Array  # (n,) variable-bound duals
    var_states: Array  # (n,) int8 ActiveState
    cons_states: Array  # (m,) int8 ActiveState


def create_iterate(problem: Problem, x: Array) -> Iterate:
    """Evaluate the problem at x (clipped into the box) into an Iterate."""
    x = problem.clip_to_bounds(jnp.asarray(x, dtype=problem.dtype))
    obj_val, obj_grad, cons_val, cons_jac = problem.eval_all(x)
    n = problem.num_variables
    m = problem.num_cons
    return Iterate(
        x=x,
        obj_val=obj_val,
        obj_grad=obj_grad,
        cons_val=cons_val,
        cons_jac=cons_jac,
        cons_dual=jnp.zeros((m,), dtype=x.dtype),
        vars_dual=jnp.zeros((n,), dtype=x.dtype),
        var_states=jnp.zeros((n,), dtype=jnp.int8),
        cons_states=jnp.zeros((m,), dtype=jnp.int8),
    )


# ---------------------------------------------------------------------------
# Violation helpers (reference: src/main/feas.c)
# ---------------------------------------------------------------------------


def violation_values(cons_val: Array, lb: Array, ub: Array) -> Array:
    """Signed residual of each constraint: positive amount outside [lb, ub]."""
    upper = jnp.maximum(cons_val - ub, 0.0)
    lower = jnp.maximum(lb - cons_val, 0.0)
    return upper + lower


def total_violation(data: ProblemData, cons_val: Array) -> Array:
    """l1 violation of the combined constraints (feas.c sleqp_total_violation)."""
    return jnp.sum(violation_values(cons_val, data.cons_lb, data.cons_ub))


def max_violation(data: ProblemData, cons_val: Array) -> Array:
    """l-inf violation (feas.c sleqp_max_violation)."""
    v = violation_values(cons_val, data.cons_lb, data.cons_ub)
    return jnp.max(v, initial=0.0)


def violated_cons_multipliers(
    data: ProblemData, cons_val: Array, cons_states: Array | None = None
) -> Array:
    """Multipliers in {-1, 0, +1} marking violated constraints.

    +1 where c > ub, -1 where c < lb (feas.c:7-90).  Entries whose
    constraint is in the working set are zeroed when states are given.
    """
    up = (cons_val > data.cons_ub).astype(cons_val.dtype)
    low = (cons_val < data.cons_lb).astype(cons_val.dtype)
    mult = up - low
    if cons_states is not None:
        mult = jnp.where(cons_states == ActiveState.INACTIVE, mult, 0.0)
    return mult


# ---------------------------------------------------------------------------
# KKT residuals (reference: src/main/iterate.c:241-528)
# ---------------------------------------------------------------------------


def stationarity_residuals(data: ProblemData, it: Iterate) -> Array:
    """∇f + J^T cons_dual + vars_dual (iterate.c:416-480)."""
    return it.obj_grad + it.cons_jac.T @ it.cons_dual + it.vars_dual


def stationarity_residuum(data: ProblemData, it: Iterate) -> Array:
    r = stationarity_residuals(data, it)
    return jnp.max(jnp.abs(r), initial=0.0)


def feasibility_residuum(data: ProblemData, it: Iterate) -> Array:
    """Max violation of the (combined) constraints (iterate.c:391-399).

    Note: variable bounds are excluded — iterates always stay in the box.
    """
    return max_violation(data, it.cons_val)


def slack_residual_values(v: Array, lb: Array, ub: Array, d: Array) -> Array:
    """Per-entry complementary-slackness residuals (iterate.c:200-239
    slack_residuum; vector form serves the SLEQP_SOLVER_STATE_VEC
    queries, pub_types.h:218-225).

    Entries with zero dual contribute exactly 0 (the reference iterates only
    the nonzeros of the sparse dual vector) — guarded explicitly so that
    inf * 0 from infinite bounds cannot produce NaNs.
    """
    up = jnp.maximum(ub - v, 0.0) * d
    low = jnp.maximum(v - lb, 0.0) * d
    return jnp.where(d > 0.0, up, jnp.where(d < 0.0, low, 0.0))


def _slack_residuum(v: Array, lb: Array, ub: Array, d: Array) -> Array:
    per_entry = slack_residual_values(v, lb, ub, d)
    return jnp.max(jnp.abs(per_entry), initial=0.0)


def slackness_residuum(data: ProblemData, it: Iterate) -> Array:
    cons_part = _slack_residuum(
        it.cons_val, data.cons_lb, data.cons_ub, it.cons_dual
    )
    var_part = _slack_residuum(it.x, data.var_lb, data.var_ub, it.vars_dual)
    return jnp.maximum(cons_part, var_part)


def kkt_residuals(data: ProblemData, it: Iterate):
    """(feasibility, slackness, stationarity) residua."""
    return (
        feasibility_residuum(data, it),
        slackness_residuum(data, it),
        stationarity_residuum(data, it),
    )


def is_optimal(
    data: ProblemData,
    it: Iterate,
    feas_tol: float,
    slack_tol: float,
    stat_tol: float,
) -> Array:
    """Optimality test (iterate.c:528-560): all three residua under tolerance."""
    feas_res, slack_res, stat_res = kkt_residuals(data, it)
    return (
        (feas_res <= feas_tol) & (stat_res < stat_tol) & (slack_res < slack_tol)
    )
