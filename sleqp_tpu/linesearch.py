"""Specialized linesearches on the piecewise-linear penalty model.

TPU-native equivalent of src/main/linesearch.c:

* ``cauchy_linesearch`` (linesearch.c:153-315): backtracks the LP step
  against the quadratic penalty model until
  ``(penalty*(v(0) - v_lin(delta)) - delta*g.d) * (1-eta) >= 0.5*delta^2*d.Hd``.
* ``trial_linesearch`` (linesearch.c:318-640, APPROX variant): finds the
  blending ``alpha`` of the Cauchy->Newton segment by backtracking on the
  quadratic merit with an Armijo-style bound using the directional merit
  derivative at the Cauchy point.

All model values are evaluated from cached direction products (no function
evaluations), and every search is a fixed `lax.while_loop`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from .iterate import Iterate, total_violation, violated_cons_multipliers
from .merit import Direction
from .problem import ProblemData
from .types import INF_THRESHOLD

Array = jax.Array

_MAX_IT = 200  # delta/alpha shrink past 1e-60 with tau=.5; 200 is ample


def cauchy_linesearch(
    data: ProblemData,
    it: Iterate,
    direction: Direction,
    penalty: Array,
    trust_radius: Array,
    tau: float,
    eta: float,
    eps: float,
):
    """Scale the Cauchy direction; returns (direction, full_step, quad_merit)."""
    exact_violation = total_violation(data, it.cons_val)
    hess_bilinear = jnp.vdot(direction.primal, direction.hess)

    norm = jnp.linalg.norm(direction.primal)
    factor = trust_radius / jnp.where(norm > 0.0, norm, 1.0)
    delta0 = jnp.minimum(factor, 1.0)

    def model_ok(delta):
        lin_viol = total_violation(
            data, it.cons_val + delta * direction.cons_jac_dot
        )
        lhs = (
            penalty * (exact_violation - lin_viol) - delta * direction.obj_dot
        ) * (1.0 - eta)
        return lhs >= 0.5 * delta * delta * hess_bilinear

    def cond(s):
        delta, done, _ = s
        return ~done

    def body(s):
        delta, _, it_count = s
        ok = model_ok(delta)
        delta_next = jnp.where(ok, delta, delta * tau)
        vanished = delta_next <= eps
        delta_next = jnp.where(vanished, 0.0, delta_next)
        done = ok | vanished | (it_count >= _MAX_IT)
        return (delta_next, done, it_count + 1)

    delta, _, _ = lax.while_loop(
        cond, body, (delta0, jnp.asarray(False), jnp.asarray(0, jnp.int32))
    )

    scaled = direction.scale(delta)
    lin_viol = total_violation(data, it.cons_val + scaled.cons_jac_dot)
    quad_merit = (
        it.obj_val
        + scaled.obj_dot
        + penalty * lin_viol
        + 0.5 * jnp.vdot(scaled.primal, scaled.hess)
    )
    full_step = delta >= delta0
    return scaled, full_step, quad_merit


def max_step_length(
    point: Array, direction: Array, lb: Array, ub: Array
) -> Array:
    """Largest alpha in [0,1] with point + alpha*direction in [lb,ub]
    (reference: util.c:127-239 sleqp_max_step_length)."""
    pos = direction > 0.0
    neg = direction < 0.0
    safe_dir = jnp.where(direction != 0.0, direction, 1.0)
    t_up = jnp.where(
        pos & (ub < INF_THRESHOLD), (ub - point) / safe_dir, jnp.inf
    )
    t_low = jnp.where(
        neg & (lb > -INF_THRESHOLD), (lb - point) / safe_dir, jnp.inf
    )
    t = jnp.minimum(jnp.min(t_up, initial=jnp.inf), jnp.min(t_low, initial=jnp.inf))
    return jnp.clip(t, 0.0, 1.0)


def trial_linesearch(
    data: ProblemData,
    it: Iterate,
    cauchy_dir: Direction,
    cauchy_quad_merit: Array,
    newton_dir: Direction,
    penalty: Array,
    tau: float,
    eta: float,
    cutoff: float,
):
    """Blend Cauchy -> Newton (APPROX rule).

    Returns (trial_direction, step_length alpha, trial_quad_merit).
    alpha = 0 reproduces the Cauchy direction exactly.
    """
    cc = jnp.vdot(cauchy_dir.primal, cauchy_dir.hess)
    cn = jnp.vdot(cauchy_dir.primal, newton_dir.hess)
    nn = jnp.vdot(newton_dir.primal, newton_dir.hess)

    cauchy_newton = newton_dir.primal - cauchy_dir.primal
    cauchy_point = it.x + cauchy_dir.primal
    alpha0 = max_step_length(
        cauchy_point, cauchy_newton, data.var_lb, data.var_ub
    )

    # directional derivative of the quadratic merit along Cauchy->Newton
    cauchy_cons_val = it.cons_val + cauchy_dir.cons_jac_dot
    viol_mult = violated_cons_multipliers(data, cauchy_cons_val)
    grad_cauchy = (
        cauchy_dir.obj_dot + jnp.vdot(viol_mult, cauchy_dir.cons_jac_dot) + cc
    )
    grad_newton = (
        newton_dir.obj_dot + jnp.vdot(viol_mult, newton_dir.cons_jac_dot) + cn
    )
    merit_grad_product = grad_newton - grad_cauchy

    def quad_merit(alpha):
        lin = (
            it.obj_val
            + (1.0 - alpha) * cauchy_dir.obj_dot
            + alpha * newton_dir.obj_dot
        )
        combined = (
            it.cons_val
            + (1.0 - alpha) * cauchy_dir.cons_jac_dot
            + alpha * newton_dir.cons_jac_dot
        )
        lin = lin + penalty * total_violation(data, combined)
        quad_term = 0.5 * (1.0 - alpha) ** 2 * cc + alpha * (
            (1.0 - alpha) * cn + 0.5 * alpha * nn
        )
        return lin + quad_term

    def cond(s):
        _, done, _ = s
        return ~done

    def body(s):
        alpha, _, count = s
        value = quad_merit(alpha)
        ok = value <= cauchy_quad_merit + eta * alpha * merit_grad_product
        alpha_next = jnp.where(ok, alpha, alpha * tau)
        vanished = alpha_next <= cutoff
        alpha_next = jnp.where(vanished, 0.0, alpha_next)
        done = ok | vanished | (count >= _MAX_IT)
        return (alpha_next, done, count + 1)

    start_vanished = alpha0 <= cutoff
    alpha, _, _ = lax.while_loop(
        cond,
        body,
        (
            jnp.where(start_vanished, 0.0, alpha0),
            start_vanished,
            jnp.asarray(0, jnp.int32),
        ),
    )

    trial = Direction(
        primal=(1.0 - alpha) * cauchy_dir.primal + alpha * newton_dir.primal,
        obj_dot=(1.0 - alpha) * cauchy_dir.obj_dot + alpha * newton_dir.obj_dot,
        hess=(1.0 - alpha) * cauchy_dir.hess + alpha * newton_dir.hess,
        cons_jac_dot=(1.0 - alpha) * cauchy_dir.cons_jac_dot
        + alpha * newton_dir.cons_jac_dot,
    )
    trial_merit = jnp.where(alpha > 0.0, quad_merit(alpha), cauchy_quad_merit)
    return trial, alpha, trial_merit


def trial_linesearch_exact(
    data: ProblemData,
    it: Iterate,
    cauchy_dir: Direction,
    cauchy_quad_merit: Array,
    newton_dir: Direction,
    penalty: Array,
    cutoff: float,
):
    """EXACT variant (linesearch.c:794-…): globally minimize the quadratic
    merit along the Cauchy->Newton segment.

    phi(alpha) = q(alpha) + penalty * sum_i viol_i(a_i + alpha b_i) is
    piecewise quadratic: q has constant curvature q2 and each constraint
    contributes a piecewise-linear violation with two breakpoints.  The
    reference sorts slope changes (linesearch.c:14-35); here we evaluate
    phi at a fixed-shape candidate set — all bound-crossing breakpoints
    plus the per-segment stationary points clipped into [0, alpha_max] —
    which contains the global minimizer (vectorized O(K*m) work instead
    of a sequential scan).
    """
    cc = jnp.vdot(cauchy_dir.primal, cauchy_dir.hess)
    cn = jnp.vdot(cauchy_dir.primal, newton_dir.hess)
    nn = jnp.vdot(newton_dir.primal, newton_dir.hess)

    cauchy_newton = newton_dir.primal - cauchy_dir.primal
    alpha_max = max_step_length(
        it.x + cauchy_dir.primal, cauchy_newton, data.var_lb, data.var_ub
    )

    # linearized constraint values: v(alpha) = a + alpha * b
    a = it.cons_val + cauchy_dir.cons_jac_dot
    b = newton_dir.cons_jac_dot - cauchy_dir.cons_jac_dot

    # quadratic part q(alpha) with q'(alpha) = q1 + q2*alpha
    q1 = (newton_dir.obj_dot - cauchy_dir.obj_dot) - cc + cn
    q2 = cc - 2.0 * cn + nn

    safe_b = jnp.where(b != 0.0, b, 1.0)
    cross_ub = jnp.where(
        (b != 0.0) & (data.cons_ub < INF_THRESHOLD),
        (data.cons_ub - a) / safe_b,
        -1.0,
    )
    cross_lb = jnp.where(
        (b != 0.0) & (data.cons_lb > -INF_THRESHOLD),
        (data.cons_lb - a) / safe_b,
        -1.0,
    )
    breaks = jnp.concatenate(
        [
            jnp.zeros((1,), dtype=a.dtype),
            jnp.reshape(alpha_max, (1,)),
            cross_ub,
            cross_lb,
        ]
    )
    breaks = jnp.clip(breaks, 0.0, alpha_max)
    breaks = jnp.sort(breaks)

    # per-segment stationary candidates: midpoints give the active
    # penalty-slope regime; solve q1 + q2*alpha + pen_slope = 0 there
    mids = 0.5 * (breaks[:-1] + breaks[1:])

    def pen_slope(alpha):
        v = a + alpha * b
        return penalty * jnp.sum(
            jnp.where(v > data.cons_ub, b, 0.0)
            - jnp.where(v < data.cons_lb, b, 0.0)
        )

    slopes = jax.vmap(pen_slope)(mids)
    safe_q2 = jnp.where(q2 != 0.0, q2, 1.0)
    stationary = jnp.where(
        q2 > 0.0, -(q1 + slopes) / safe_q2, mids
    )
    stationary = jnp.clip(stationary, breaks[:-1], breaks[1:])

    candidates = jnp.concatenate([breaks, stationary])

    def phi(alpha):
        lin = (
            it.obj_val
            + (1.0 - alpha) * cauchy_dir.obj_dot
            + alpha * newton_dir.obj_dot
        )
        v = a + alpha * b
        viol = jnp.sum(
            jnp.maximum(v - data.cons_ub, 0.0)
            + jnp.maximum(data.cons_lb - v, 0.0)
        )
        quad = 0.5 * (1.0 - alpha) ** 2 * cc + alpha * (
            (1.0 - alpha) * cn + 0.5 * alpha * nn
        )
        return lin + penalty * viol + quad

    values = jax.vmap(phi)(candidates)
    best = jnp.argmin(values)
    alpha = candidates[best]
    best_value = values[best]

    # keep the Cauchy point when no candidate improves on it
    use_cauchy = (best_value >= cauchy_quad_merit) | (alpha <= cutoff)
    alpha = jnp.where(use_cauchy, 0.0, alpha)

    trial = Direction(
        primal=(1.0 - alpha) * cauchy_dir.primal + alpha * newton_dir.primal,
        obj_dot=(1.0 - alpha) * cauchy_dir.obj_dot + alpha * newton_dir.obj_dot,
        hess=(1.0 - alpha) * cauchy_dir.hess + alpha * newton_dir.hess,
        cons_jac_dot=(1.0 - alpha) * cauchy_dir.cons_jac_dot
        + alpha * newton_dir.cons_jac_dot,
    )
    trial_merit = jnp.where(use_cauchy, cauchy_quad_merit, best_value)
    return trial, alpha, trial_merit
