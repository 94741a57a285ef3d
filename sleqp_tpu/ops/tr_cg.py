"""Steihaug projected conjugate gradient for the trust-region EQP step.

TPU-native equivalent of the reference tr/steihaug_solver.c: minimize
``g^T d + 0.5 d^T H d`` subject to ``A_W d = 0`` and ``||d|| <= radius``,
where H products come from a callback and feasibility w.r.t. the working
set is maintained by projecting residuals onto null(A_W) each iteration
(the reference drives aug_jac project_nullspace per CG iteration,
newton.c:443 + tr/steihaug_solver.c).

Implemented as a single `lax.while_loop` state machine with fixed maximum
iteration count — no reverse communication.  Negative curvature and
trust-region crossing both terminate with a step to the boundary.

Also records min/max Rayleigh quotients encountered (reference:
newton.c:318-346 records the spectrum for reporting).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .kkt import AugJac, project_nullspace

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TRResult:
    step: Array  # (n,) trust-region step (in null(A_W), ||step|| <= radius)
    on_boundary: Array  # bool
    iterations: Array  # int32
    min_rayleigh: Array
    max_rayleigh: Array


def _boundary_tau(d: Array, p: Array, radius: Array) -> Array:
    """Largest tau >= 0 with ||d + tau p|| = radius (tr/tr_util.c)."""
    pp = jnp.vdot(p, p)
    dp = jnp.vdot(d, p)
    dd = jnp.vdot(d, d)
    safe_pp = jnp.where(pp > 0.0, pp, 1.0)
    disc = jnp.maximum(dp * dp + safe_pp * (radius * radius - dd), 0.0)
    tau = (-dp + jnp.sqrt(disc)) / safe_pp
    return jnp.where(pp > 0.0, tau, 0.0)


def steihaug_cg(
    hess_prod: Callable[[Array], Array],
    aug_jac: AugJac,
    gradient: Array,
    radius: Array,
    max_iterations: int,
    rel_tol: float = 1e-8,
    abs_tol: float = 1e-12,
    p0: Array | None = None,
) -> TRResult:
    """Projected CG with Steihaug boundary handling.

    ``hess_prod`` maps d -> H d (Hessian of the Lagrangian; may be
    indefinite).  ``gradient`` is the EQP gradient (newton.c:357-397).
    ``p0`` optionally supplies the initial nullspace projection (see
    gltr: the mixed-precision caller passes a float64-computed one).
    """
    n = gradient.shape[0]
    dtype = gradient.dtype
    radius = jnp.asarray(radius, dtype=dtype)

    z0 = (
        project_nullspace(aug_jac, gradient)
        if p0 is None
        else p0.astype(dtype)
    )
    rz0 = jnp.vdot(gradient, z0)
    # Tolerance on the projected-gradient norm (residual in the null space).
    tol_sq = jnp.maximum(rel_tol * rel_tol * jnp.abs(rz0), abs_tol * abs_tol)

    init = dict(
        d=jnp.zeros((n,), dtype=dtype),
        r=gradient,
        z=z0,
        p=-z0,
        rz=rz0,
        it=jnp.asarray(0, dtype=jnp.int32),
        done=rz0 <= tol_sq,
        on_boundary=jnp.asarray(False),
        min_ray=jnp.asarray(jnp.inf, dtype=dtype),
        max_ray=jnp.asarray(-jnp.inf, dtype=dtype),
    )

    def cond(s):
        return jnp.logical_and(~s["done"], s["it"] < max_iterations)

    def body(s):
        p = s["p"]
        Hp = hess_prod(p)
        pp = jnp.vdot(p, p)
        pHp = jnp.vdot(p, Hp)
        safe_pp = jnp.where(pp > 0.0, pp, 1.0)
        rayleigh = pHp / safe_pp
        min_ray = jnp.minimum(s["min_ray"], rayleigh)
        max_ray = jnp.maximum(s["max_ray"], rayleigh)

        neg_curv = pHp <= 1e-14 * pp

        safe_pHp = jnp.where(neg_curv, 1.0, pHp)
        alpha = s["rz"] / safe_pHp

        d_next = s["d"] + alpha * p
        crosses = jnp.vdot(d_next, d_next) >= radius * radius

        # Boundary step for either negative curvature or TR crossing.
        tau = _boundary_tau(s["d"], p, radius)
        d_boundary = s["d"] + tau * p

        hit_boundary = jnp.logical_or(neg_curv, crosses)

        r_next = s["r"] + alpha * Hp
        z_next = project_nullspace(aug_jac, r_next)
        rz_next = jnp.vdot(r_next, z_next)
        # Guard: projected curvature can make rz slightly negative.
        converged = rz_next <= tol_sq

        beta = rz_next / jnp.where(s["rz"] != 0.0, s["rz"], 1.0)
        p_next = -z_next + beta * p

        d_out = jnp.where(hit_boundary, d_boundary, d_next)
        return dict(
            d=d_out,
            r=jnp.where(hit_boundary, s["r"], r_next),
            z=jnp.where(hit_boundary, s["z"], z_next),
            p=jnp.where(hit_boundary, s["p"], p_next),
            rz=jnp.where(hit_boundary, s["rz"], rz_next),
            it=s["it"] + 1,
            done=jnp.logical_or(hit_boundary, converged),
            on_boundary=jnp.logical_or(s["on_boundary"], hit_boundary),
            min_ray=min_ray,
            max_ray=max_ray,
        )

    final = lax.while_loop(cond, body, init)
    zero_spectrum = final["it"] == 0
    return TRResult(
        step=final["d"],
        on_boundary=final["on_boundary"],
        iterations=final["it"],
        min_rayleigh=jnp.where(zero_spectrum, 0.0, final["min_ray"]),
        max_rayleigh=jnp.where(zero_spectrum, 0.0, final["max_ray"]),
    )
