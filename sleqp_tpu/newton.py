"""EQP (Newton) step: working step + trust-region CG on the working set.

TPU-native equivalent of src/main/working_step.c + src/main/newton.c:

1. *Working step* d0: min-norm step onto the working-set bounds
   (working_step.c:112-315 compute_initial_rhs/direction), scaled into
   ``norm_ratio * trust_radius`` if too long (working_step.c:356-405), with
   the reduced trust radius for the tangential step.
2. *Violated multipliers* at the linearized constraint values of d0
   (working_step.c:412-447).
3. *EQP gradient* grad = ∇f + H d0 + penalty * J^T violated_mult
   (newton.c:349-390 compute_gradient).
4. Steihaug projected CG in null(A_W) within the reduced radius
   (newton.c:443-556 via tr/steihaug_solver.c), then newton_step = d0 + t.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .iterate import Iterate, violated_cons_multipliers
from .merit import Direction, make_direction
from .ops.kkt import AugJac, solve_min_norm
from .ops.tr_cg import TRResult, steihaug_cg
from .problem import ProblemData
from .types import INF_THRESHOLD, ActiveState

Array = jax.Array

# Fraction of the trust radius the initial step may consume
# (working_step.c:12).
NORM_RATIO = 0.8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WorkingStep:
    """Initial EQP step data (reference SleqpWorkingStep state)."""

    step: Array  # (n,) d0
    cons_jac_dot: Array  # (m,) J d0
    obj_dot: Array  # scalar ∇f·d0
    initial_cons_val: Array  # (m,) c + J d0
    violated_mult: Array  # (m,) in {-1,0,1}, excluding working set
    reduced_trust_radius: Array  # scalar


def _working_set_rhs(data: ProblemData, it: Iterate) -> Array:
    """Target values b - v per working-set row (working_step.c:112-276).

    For active-at-lower rows the min-norm step must produce
    ``lb - value``, at upper ``ub - value`` (ACTIVE_BOTH uses the lower
    bound; bounds coincide there).
    """

    def per(v, lb, ub, states):
        lower_diff = jnp.where(lb > -INF_THRESHOLD, lb - v, 0.0)
        upper_diff = jnp.where(ub < INF_THRESHOLD, ub - v, 0.0)
        rhs = jnp.where(states == ActiveState.ACTIVE_UPPER, upper_diff, 0.0)
        rhs = jnp.where(
            (states == ActiveState.ACTIVE_LOWER)
            | (states == ActiveState.ACTIVE_BOTH),
            lower_diff,
            rhs,
        )
        return rhs

    var_rhs = per(it.x, data.var_lb, data.var_ub, it.var_states)
    cons_rhs = per(it.cons_val, data.cons_lb, data.cons_ub, it.cons_states)
    return jnp.concatenate([var_rhs, cons_rhs])


def compute_working_step(
    data: ProblemData,
    it: Iterate,
    aug_jac: AugJac,
    trust_radius: Array,
    eps: float = 1e-10,
) -> WorkingStep:
    """d0 + reduced radius + violated multipliers (working_step.c:452-483)."""
    rhs = _working_set_rhs(data, it)
    d0 = solve_min_norm(aug_jac, rhs)

    norm = jnp.linalg.norm(d0)
    alpha_raw = (NORM_RATIO * trust_radius) / jnp.where(norm > 0.0, norm, 1.0)
    alpha = jnp.minimum(alpha_raw, 1.0)
    full = alpha >= 1.0 - eps  # no scaling required
    d0 = jnp.where(norm > 0.0, d0 * jnp.where(full, 1.0, alpha), d0)

    reduced_full = jnp.sqrt(
        jnp.maximum(trust_radius * trust_radius - norm * norm, 0.0)
    )
    reduced_scaled = trust_radius * jnp.sqrt(1.0 - NORM_RATIO * NORM_RATIO)
    reduced = jnp.where(
        norm == 0.0, trust_radius, jnp.where(full, reduced_full, reduced_scaled)
    )

    cons_jac_dot = it.cons_jac @ d0
    initial_cons_val = it.cons_val + cons_jac_dot
    violated = violated_cons_multipliers(data, initial_cons_val, it.cons_states)

    return WorkingStep(
        step=d0,
        cons_jac_dot=cons_jac_dot,
        obj_dot=jnp.vdot(it.obj_grad, d0),
        initial_cons_val=initial_cons_val,
        violated_mult=violated,
        reduced_trust_radius=reduced,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NewtonResult:
    direction: Direction  # the full Newton direction (d0 + TR step)
    tr: TRResult


def compute_newton_step(
    data: ProblemData,
    it: Iterate,
    aug_jac: AugJac,
    ws: WorkingStep,
    hess_prod: Callable[[Array], Array],
    penalty: Array,
    max_iterations: int,
    use_gltr: bool = False,
    compute_dtype=None,
    hess_prod_compute: Callable[[Array], Array] | None = None,
) -> NewtonResult:
    """EQP direction (newton.c:443-556 newton_solver_compute_direction).

    ``hess_prod`` must already close over the EQP multipliers
    (cons_dual + penalty*violated, newton.c:194-216).  ``use_gltr``
    selects the Lanczos/More-Sorensen solver (trlib equivalent) instead
    of Steihaug projected CG (newton.c:96-106 auto-selection).

    With ``compute_dtype`` (mixed precision): the EQP gradient and the
    final direction stay in the state dtype, while the Krylov loop — the
    per-iteration hess_prod + nullspace projection hot path — runs in the
    compute dtype.  ``hess_prod_compute`` should be a natively-low-
    precision Hessian operator (AD traced at the cast iterate); falling
    back to casting around ``hess_prod`` would re-introduce emulated
    float64 ops inside the loop.
    """
    sdtype = it.obj_grad.dtype
    gradient = (
        it.obj_grad
        + hess_prod(ws.step)
        + penalty * (it.cons_jac.T @ ws.violated_mult)
    )

    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else sdtype
    if cd != sdtype:
        hp_c = hess_prod_compute or (
            lambda d: hess_prod(d.astype(sdtype)).astype(cd)
        )
        aug_c = AugJac(
            chol=aug_jac.chol.astype(cd),
            cons_jac=aug_jac.cons_jac.astype(cd),
            active_var=aug_jac.active_var.astype(cd),
            active_cons=aug_jac.active_cons.astype(cd),
        )
        grad_c = gradient.astype(cd)
        rad_c = ws.reduced_trust_radius.astype(cd)
        # Near convergence P g cancels catastrophically; do the initial
        # projection at full precision and hand it to the Krylov loop.
        from .ops.kkt import project_nullspace

        p0 = project_nullspace(aug_jac, gradient).astype(cd)
    else:
        hp_c, aug_c, grad_c, rad_c = (
            hess_prod,
            aug_jac,
            gradient,
            ws.reduced_trust_radius,
        )
        p0 = None

    if use_gltr:
        from .ops.gltr import gltr

        tr = gltr(
            hp_c,
            aug_c,
            grad_c,
            rad_c,
            max_iterations=max_iterations,
            p0=p0,
        )
    else:
        tr = steihaug_cg(
            hp_c,
            aug_c,
            grad_c,
            rad_c,
            max_iterations=max_iterations,
            p0=p0,
        )
    if cd != sdtype:
        tr = TRResult(
            step=tr.step.astype(sdtype),
            on_boundary=tr.on_boundary,
            iterations=tr.iterations,
            min_rayleigh=tr.min_rayleigh.astype(sdtype),
            max_rayleigh=tr.max_rayleigh.astype(sdtype),
        )
    # Degenerate radius: only the initial step survives (newton.c:501-508)
    zero_radius = ws.reduced_trust_radius <= 1e-20
    step = jnp.where(zero_radius, ws.step, ws.step + tr.step)

    direction = make_direction(it, step, hess_prod(step))
    return NewtonResult(direction=direction, tr=tr)
