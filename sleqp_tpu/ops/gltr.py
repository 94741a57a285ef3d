"""GLTR trust-region solver: projected Lanczos + tridiagonal Moré-Sorensen.

TPU-native replacement for trlib (the reference's required external GLTR
library driven by reverse communication from tr/trlib_solver.c:17-50):
solve

    min  g^T d + 0.5 d^T H d   s.t.  A_W d = 0,  ||d|| <= radius

for possibly **indefinite** H.  A projected Lanczos recursion builds an
orthonormal basis V of the Krylov space in null(A_W) with tridiagonal
T = V^T H V; each step solves the reduced TR problem

    min  gamma0 * e1^T h + 0.5 h^T T h   s.t.  ||h|| <= radius

by a safeguarded Newton iteration on the secular equation
``1/||h(lam)|| - 1/radius = 0`` with Cholesky factorizations of T + lam I
(More-Sorensen), then d = V h.  Unlike Steihaug CG this follows negative
curvature through the interior and returns near-exact boundary solutions.

Everything is fixed-shape: the Lanczos basis is a (K, n) buffer with K
static (bounded by max iterations), padding rows of T carry unit diagonal
and zero rhs so they never influence the solution.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .kkt import AugJac, project_nullspace
from .tr_cg import TRResult

Array = jax.Array


def _tridiag_tr_solve(
    alphas: Array,  # (K,) diagonal (padded with 1.0)
    betas: Array,  # (K,) off-diagonal (padded with 0.0); betas[0] unused
    gamma0: Array,  # ||P g||
    radius: Array,
    k: Array,  # current active dimension (1..K)
    lam_warm: Array | None = None,  # warm-start multiplier from last call
    newton_iters: int = 25,
):
    """More-Sorensen on the (padded) tridiagonal; returns (h, lam, interior)."""
    K = alphas.shape[0]
    dtype = alphas.dtype
    idx = jnp.arange(K)
    active = idx < k

    # padded T: inactive rows get diag 1, offdiag 0
    diag = jnp.where(active, alphas, 1.0)
    off = jnp.where(idx[1:] < k, betas[1:], 0.0)
    T = (
        jnp.diag(diag)
        + jnp.diag(off, 1)
        + jnp.diag(off, -1)
    )
    rhs = jnp.zeros((K,), dtype=dtype).at[0].set(-gamma0)

    # Gershgorin lower bound on eigenvalues of the active block
    gersh = jnp.where(
        active,
        alphas
        - jnp.abs(jnp.concatenate([jnp.zeros((1,), dtype), betas[1:]]))
        - jnp.abs(jnp.concatenate([betas[1:], jnp.zeros((1,), dtype)]))
        * (idx + 1 < k),
        jnp.inf,
    )
    lam_lo = jnp.maximum(0.0, -jnp.min(gersh))

    def solve_at(lam):
        L = jnp.linalg.cholesky(T + lam * jnp.eye(K, dtype=dtype))
        ok = ~jnp.any(jnp.isnan(L))
        L_safe = jnp.where(ok, L, jnp.eye(K, dtype=dtype))
        h = jax.scipy.linalg.cho_solve((L_safe, True), rhs)
        return h, L_safe, ok

    # interior test at lam = 0
    h0, _, pd0 = solve_at(jnp.asarray(0.0, dtype))
    norm0 = jnp.linalg.norm(h0)
    interior = pd0 & (norm0 <= radius)

    def newton_body(i, s):
        lam, last_ok = s
        h, L, ok = solve_at(lam)
        norm = jnp.maximum(jnp.linalg.norm(h), 1e-300)
        # Newton step on 1/norm - 1/radius (More-Sorensen):
        # w = L^-1 h;  dlam = (norm/||w||)^2 * (norm - radius)/radius
        w = jax.scipy.linalg.solve_triangular(L, h, lower=True)
        wnorm2 = jnp.maximum(jnp.vdot(w, w), 1e-300)
        dlam = (norm * norm / wnorm2) * (norm - radius) / radius
        cand = jnp.maximum(lam + dlam, 0.0)
        # Cholesky failure => lam dipped below -lambda_min: bisect back
        # toward the last PD value
        lam_next = jnp.where(ok, cand, 0.5 * (lam + last_ok))
        last_ok_next = jnp.where(ok, lam, last_ok)
        return (lam_next, last_ok_next)

    # Gershgorin start is guaranteed PD; Newton may legitimately move
    # below it (the bound is conservative), failures bisect back up.
    # A warm multiplier from the previous (one-smaller) tridiagonal is a
    # much better start (trlib updates its factorization incrementally).
    lam_init = lam_lo + 1e-12
    if lam_warm is not None:
        lam_init = jnp.maximum(lam_warm, lam_init)
    lam, _ = lax.fori_loop(
        0, newton_iters, newton_body, (lam_init, lam_lo + 1e-12)
    )
    h_b, _, _ = solve_at(lam)
    # exact boundary scaling guard
    norm_b = jnp.linalg.norm(h_b)
    h_b = h_b * jnp.where(
        norm_b > radius, radius / jnp.maximum(norm_b, 1e-300), 1.0
    )

    h = jnp.where(interior, h0, h_b)
    lam = jnp.where(interior, 0.0, lam)
    return h, lam, interior


_MS_WARM_ITERS = 12  # Newton iterations when warm-started


def gltr(
    hess_prod: Callable[[Array], Array],
    aug_jac: AugJac,
    gradient: Array,
    radius: Array,
    max_iterations: int,
    rel_tol: float = 1e-8,
) -> TRResult:
    """GLTR solve; interface mirrors steihaug_cg."""
    n = gradient.shape[0]
    dtype = gradient.dtype
    radius = jnp.asarray(radius, dtype=dtype)
    K = min(max(int(max_iterations), 1), n + 1)

    p0 = project_nullspace(aug_jac, gradient)
    gamma0 = jnp.linalg.norm(p0)
    tol = rel_tol * jnp.maximum(gamma0, 1.0)
    trivial = gamma0 <= 1e-300

    v1 = p0 / jnp.where(trivial, 1.0, gamma0)

    init = dict(
        V=jnp.zeros((K, n), dtype=dtype).at[0].set(v1),
        alphas=jnp.ones((K,), dtype=dtype),
        betas=jnp.zeros((K,), dtype=dtype),
        h=jnp.zeros((K,), dtype=dtype),
        lam=jnp.asarray(0.0, dtype=dtype),
        k=jnp.asarray(1, jnp.int32),
        done=trivial,
        interior=jnp.asarray(True),
        min_ray=jnp.asarray(jnp.inf, dtype=dtype),
        max_ray=jnp.asarray(-jnp.inf, dtype=dtype),
    )

    def cond(s):
        return (~s["done"]) & (s["k"] <= K)

    def body(s):
        j = s["k"] - 1  # current Lanczos index (0-based)
        v_j = s["V"][j]
        w = project_nullspace(aug_jac, hess_prod(v_j))
        alpha_j = jnp.vdot(v_j, w)
        alphas = s["alphas"].at[j].set(alpha_j)

        min_ray = jnp.minimum(s["min_ray"], alpha_j)
        max_ray = jnp.maximum(s["max_ray"], alpha_j)

        # full reorthogonalization against the stored basis (stability)
        coeffs = s["V"] @ w  # (K,), zero rows contribute nothing
        w = w - s["V"].T @ coeffs
        beta_next = jnp.linalg.norm(w)

        # reduced TR solve with the updated tridiagonal (warm-started)
        h, lam, interior = _tridiag_tr_solve(
            alphas,
            s["betas"],
            gamma0,
            radius,
            s["k"],
            lam_warm=s["lam"],
            newton_iters=_MS_WARM_ITERS,
        )

        # GLTR convergence: Lanczos residual |beta_{k} * h_k|
        resid = beta_next * jnp.abs(h[j])
        converged = resid <= tol
        breakdown = beta_next <= 1e-14 * jnp.maximum(gamma0, 1.0)

        k_next = s["k"] + 1
        can_store = k_next <= K
        V_next = lax.cond(
            can_store & ~converged & ~breakdown,
            lambda V: V.at[jnp.minimum(k_next - 1, K - 1)].set(
                w / jnp.where(beta_next > 0.0, beta_next, 1.0)
            ),
            lambda V: V,
            s["V"],
        )
        betas = s["betas"].at[jnp.minimum(k_next - 1, K - 1)].set(
            jnp.where(can_store, beta_next, 0.0)
        )

        return dict(
            V=V_next,
            alphas=alphas,
            betas=betas,
            h=h,
            lam=lam,
            k=k_next,
            done=converged | breakdown | (k_next > K),
            interior=interior,
            min_ray=min_ray,
            max_ray=max_ray,
        )

    final = lax.while_loop(cond, body, init)
    d = final["V"].T @ final["h"]
    d = jnp.where(trivial, jnp.zeros_like(d), d)
    # final safeguard: never exceed the radius
    dn = jnp.linalg.norm(d)
    d = d * jnp.where(dn > radius, radius / jnp.maximum(dn, 1e-300), 1.0)

    iters = final["k"] - 1
    zero_spectrum = iters == 0
    return TRResult(
        step=d,
        on_boundary=~final["interior"],
        iterations=iters,
        min_rayleigh=jnp.where(zero_spectrum, 0.0, final["min_ray"]),
        max_rayleigh=jnp.where(zero_spectrum, 0.0, final["max_ray"]),
    )
