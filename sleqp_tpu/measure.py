"""Per-step nonlinearity diagnostics.

TPU-native equivalent of src/main/measure.c: after each trial evaluation,
split the merit change into objective vs violation, compare the model
("expected") against the actual values, and estimate curvature-scale
nonlinearity measures

    obj_nonlin  = 2 (f(x) + g·d - f(x+d)) / ||d||^2        (measure.c:73-89)
    cons_nonlin = 2 ||c(x) + J d - c(x+d)||_inf / ||d||^2  (measure.c:107-148)
    lag_nonlin  = obj_nonlin + mu·cons_nonlin_vec          (measure.c:92-104)

plus the expected/actual reductions of the objective, the total violation,
and the merit (measure.c:237-295 report_lsq/report_merit).  Everything is
a fixed-shape scalar pytree carried on the solver state; the host-side
Solver logs it at debug level like the reference
(problem_solver/iteration.c:308-332 report_trial_point).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .iterate import Iterate, total_violation
from .merit import Direction
from .problem import ProblemData

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Measure:
    """Scalar nonlinearity/reduction diagnostics of the last trial step."""

    step_norm: Array
    obj_nonlin: Array
    cons_nonlin: Array  # inf-norm of the per-constraint nonlinearity
    lag_nonlin: Array
    # objective: current / model ("expected", incl. 0.5 d'Hd) / actual
    obj_current: Array
    obj_expected: Array
    obj_actual: Array
    # total l1 violation: current / linearized / actual
    vio_current: Array
    vio_expected: Array
    vio_actual: Array


def empty_measure(dtype) -> Measure:
    z = jnp.asarray(0.0, dtype=dtype)
    return Measure(
        step_norm=z, obj_nonlin=z, cons_nonlin=z, lag_nonlin=z,
        obj_current=z, obj_expected=z, obj_actual=z,
        vio_current=z, vio_expected=z, vio_actual=z,
    )


def compute_measure(
    data: ProblemData,
    it: Iterate,
    trial_it: Iterate,
    direction: Direction,
    multipliers: Array,
) -> Measure:
    """All diagnostics of one trial step (measure.c:152-171
    sleqp_measure_set_iterates)."""
    d = direction.primal
    norm_sq = jnp.vdot(d, d)
    safe_norm_sq = jnp.where(norm_sq > 0.0, norm_sq, 1.0)
    hess_dot = jnp.vdot(d, direction.hess)

    obj_linear = it.obj_val + direction.obj_dot
    obj_nonlin = jnp.where(
        norm_sq > 0.0,
        (obj_linear - trial_it.obj_val) * (2.0 / safe_norm_sq),
        0.0,
    )

    expected_cons = it.cons_val + direction.cons_jac_dot
    cons_nonlin_vec = jnp.where(
        norm_sq > 0.0,
        (expected_cons - trial_it.cons_val) * (2.0 / safe_norm_sq),
        jnp.zeros_like(expected_cons),
    )
    lag_nonlin = obj_nonlin + jnp.vdot(cons_nonlin_vec, multipliers)

    return Measure(
        step_norm=jnp.sqrt(norm_sq),
        obj_nonlin=obj_nonlin,
        cons_nonlin=jnp.max(jnp.abs(cons_nonlin_vec), initial=0.0),
        lag_nonlin=lag_nonlin,
        obj_current=it.obj_val,
        obj_expected=obj_linear + 0.5 * hess_dot,
        obj_actual=trial_it.obj_val,
        vio_current=total_violation(data, it.cons_val),
        vio_expected=total_violation(data, expected_cons),
        vio_actual=total_violation(data, trial_it.cons_val),
    )


def _percent_reduction(current: float, trial: float) -> float:
    """measure.c:222-234."""
    if current == 0.0:
        return 0.0
    value = 100.0 * (current - trial) / current
    return -value if current < 0.0 else value


def format_measure(m: Measure, penalty: float) -> str:
    """Debug-level report (measure.c:237-295, host side)."""
    oc, oe, oa = (
        float(m.obj_current), float(m.obj_expected), float(m.obj_actual)
    )
    vc, ve, va = (
        float(m.vio_current), float(m.vio_expected), float(m.vio_actual)
    )
    lines = [
        (
            f"Objective: current: {oc:14e}, expected: {oe:14e}, "
            f"actual: {oa:14e}, predicted reduction: "
            f"{_percent_reduction(oc, oe):9.4f}%, actual reduction: "
            f"{_percent_reduction(oc, oa):9.4f}%"
        ),
        (
            f"Violation: current: {vc:14e}, expected: {ve:14e}, "
            f"actual: {va:14e}, predicted reduction: "
            f"{_percent_reduction(vc, ve):9.4f}%, actual reduction: "
            f"{_percent_reduction(vc, va):9.4f}%"
        ),
        (
            f"Objective nonlinearity: {float(m.obj_nonlin):g}, "
            f"maximal constraint nonlinearity: {float(m.cons_nonlin):g}, "
            f"Lagrangean nonlinearity: {float(m.lag_nonlin):g} "
            f"(step norm: {float(m.step_norm):g})"
        ),
    ]
    return "\n".join(lines)
