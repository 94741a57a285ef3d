"""Trust-region LSQR (Golub-Kahan bidiagonalization).

TPU-native equivalent of src/main/tr/lsqr.c: iterative solution of
``min ||b - A d||`` through user-supplied forward/adjoint products, with
Steihaug-style termination at the trust-region boundary (LSQR iterate
norms increase monotonically, so the first crossing is final).

Used by the Gauss-Newton EQP solver (gauss_newton.c) where
``A = [J_r; sqrt(penalty) * J_W-violated] P`` with P the working-set
nullspace projector.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def lsqr_tr(
    forward: Callable[[Array], Array],
    adjoint: Callable[[Array], Array],
    b: Array,
    radius: Array,
    n: int,
    max_iterations: int,
    rel_tol: float = 1e-8,
):
    """Returns the (boundary-clipped) LSQR iterate minimizing ||b - A d||."""
    dtype = b.dtype
    radius = jnp.asarray(radius, dtype=dtype)

    beta0 = jnp.linalg.norm(b)
    safe_beta0 = jnp.where(beta0 > 0.0, beta0, 1.0)
    u = b / safe_beta0
    v_raw = adjoint(u)
    alpha0 = jnp.linalg.norm(v_raw)
    safe_alpha0 = jnp.where(alpha0 > 0.0, alpha0, 1.0)
    v = v_raw / safe_alpha0

    init = dict(
        d=jnp.zeros((n,), dtype=dtype),
        u=u,
        v=v,
        w=v,
        alpha=alpha0,
        beta=beta0,
        phi_bar=beta0,
        rho_bar=alpha0,
        it=jnp.asarray(0, jnp.int32),
        done=(beta0 == 0.0) | (alpha0 == 0.0),
    )
    tol = rel_tol * alpha0 * beta0

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iterations)

    def body(s):
        # bidiagonalization step
        u_next = forward(s["v"]) - s["alpha"] * s["u"]
        beta = jnp.linalg.norm(u_next)
        safe_beta = jnp.where(beta > 0.0, beta, 1.0)
        u_next = u_next / safe_beta

        v_next = adjoint(u_next) - beta * s["v"]
        alpha = jnp.linalg.norm(v_next)
        safe_alpha = jnp.where(alpha > 0.0, alpha, 1.0)
        v_next = v_next / safe_alpha

        # Givens rotation
        rho = jnp.sqrt(s["rho_bar"] ** 2 + beta**2)
        c = s["rho_bar"] / rho
        sn = beta / rho
        theta = sn * alpha
        rho_bar = -c * alpha
        phi = c * s["phi_bar"]
        phi_bar = sn * s["phi_bar"]

        d_next = s["d"] + (phi / rho) * s["w"]
        w_next = v_next - (theta / rho) * s["w"]

        # trust region crossing: ||d|| grows monotonically in LSQR
        crosses = jnp.vdot(d_next, d_next) >= radius * radius
        norm = jnp.linalg.norm(d_next)
        d_clipped = d_next * (radius / jnp.where(norm > 0.0, norm, 1.0))
        d_out = jnp.where(crosses, d_clipped, d_next)

        converged = jnp.abs(phi_bar * alpha * c) <= tol
        return dict(
            d=d_out,
            u=u_next,
            v=v_next,
            w=w_next,
            alpha=alpha,
            beta=beta,
            phi_bar=phi_bar,
            rho_bar=rho_bar,
            it=s["it"] + 1,
            done=crosses | converged,
        )

    final = lax.while_loop(cond, body, init)
    return final["d"], final["it"]
