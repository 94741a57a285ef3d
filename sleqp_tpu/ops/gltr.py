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


def _tridiag_ldl(diag: Array, off: Array, lam: Array):
    """LDL^T of (T + lam I): d (K,), l (K-1,), pd flag — O(K) scan.

    d_1 = a_1 + lam;  l_i = b_i / d_i;  d_{i+1} = a_{i+1} + lam - l_i b_i.
    Padded rows (diag 1, off 0) decouple.
    """
    dtype = diag.dtype

    def step(d_prev, inp):
        a_i, b_im1 = inp
        safe = jnp.where(jnp.abs(d_prev) > jnp.finfo(dtype).tiny, d_prev, jnp.finfo(dtype).tiny)
        l_i = b_im1 / safe
        d_i = a_i + lam - l_i * b_im1
        return d_i, (d_i, l_i)

    d0 = diag[0] + lam
    _, (ds, ls) = lax.scan(step, d0, (diag[1:], off))
    d = jnp.concatenate([d0[None], ds])
    pd = jnp.all(d > 0.0)
    return d, ls, pd


def _tridiag_solve(d: Array, l: Array, rhs: Array):
    """Solve L D L^T h = rhs given the LDL factors — three O(K) scans.

    Returns (h, wnorm2) with wnorm2 = ||(L sqrt(D))^{-1} h||^2 =
    sum v_i^2 / d_i for v = L^{-1} h — the More-Sorensen Newton
    denominator ||L_c^{-1} p||^2 with p the solution.
    """
    dtype = d.dtype

    def fwd(u_prev, inp):
        r_i, l_im1 = inp
        u_i = r_i - l_im1 * u_prev
        return u_i, u_i

    u0 = rhs[0]
    _, us = lax.scan(fwd, u0, (rhs[1:], l))
    u = jnp.concatenate([u0[None], us])

    safe_d = jnp.where(jnp.abs(d) > jnp.finfo(dtype).tiny, d, jnp.finfo(dtype).tiny)
    z = u / safe_d

    def bwd(h_next, inp):
        z_i, l_i = inp
        h_i = z_i - l_i * h_next
        return h_i, h_i

    hK = z[-1]
    _, hs = lax.scan(bwd, hK, (z[:-1], l), reverse=True)
    h = jnp.concatenate([hs, hK[None]])

    # v = L^{-1} h for the MS denominator
    v0 = h[0]
    _, vs = lax.scan(fwd, v0, (h[1:], l))
    v = jnp.concatenate([v0[None], vs])
    wnorm2 = jnp.sum(v * v / safe_d)
    return h, wnorm2


def _tridiag_tr_solve(
    alphas: Array,  # (K,) diagonal (padded with 1.0)
    betas: Array,  # (K,) off-diagonal (padded with 0.0); betas[0] unused
    gamma0: Array,  # ||P g||
    radius: Array,
    k: Array,  # current active dimension (1..K)
    lam_warm: Array | None = None,  # warm-start multiplier from last call
    newton_iters: int = 25,
):
    """More-Sorensen on the (padded) tridiagonal via O(K) LDL^T scans."""
    K = alphas.shape[0]
    dtype = alphas.dtype
    idx = jnp.arange(K)
    active = idx < k

    diag = jnp.where(active, alphas, 1.0)
    off = jnp.where(idx[1:] < k, betas[1:], 0.0)
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
        d, l, pd = _tridiag_ldl(diag, off, lam)
        h, wnorm2 = _tridiag_solve(d, l, rhs)
        h = jnp.where(pd, h, 0.0)
        return h, wnorm2, pd

    # interior test at lam = 0
    h0, _, pd0 = solve_at(jnp.asarray(0.0, dtype))
    norm0 = jnp.linalg.norm(h0)
    interior = pd0 & (norm0 <= radius)

    def newton_body(i, s):
        lam, last_ok = s
        h, wnorm2, ok = solve_at(lam)
        norm = jnp.maximum(jnp.linalg.norm(h), jnp.finfo(dtype).tiny)
        # Newton step on 1/norm - 1/radius (More-Sorensen)
        wnorm2 = jnp.maximum(wnorm2, jnp.finfo(dtype).tiny)
        dlam = (norm * norm / wnorm2) * (norm - radius) / radius
        cand = jnp.maximum(lam + dlam, 0.0)
        # factorization failure => lam below -lambda_min: bisect back
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
        norm_b > radius, radius / jnp.maximum(norm_b, jnp.finfo(dtype).tiny), 1.0
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
    p0: Array | None = None,
) -> TRResult:
    """GLTR solve; interface mirrors steihaug_cg.

    ``p0`` optionally supplies the initial nullspace projection of the
    gradient (the mixed-precision caller computes it in float64: near
    convergence ``P g`` is a catastrophic cancellation of O(|g|) terms,
    and a float32 projection poisons the whole Krylov basis).
    """
    n = gradient.shape[0]
    dtype = gradient.dtype
    radius = jnp.asarray(radius, dtype=dtype)
    K = min(max(int(max_iterations), 1), n + 1)

    if p0 is None:
        p0 = project_nullspace(aug_jac, gradient)
    else:
        p0 = p0.astype(dtype)
    gamma0 = jnp.linalg.norm(p0)
    eps = float(jnp.finfo(dtype).eps)
    # Relative termination (trlib semantics: residual vs ||P g||); an
    # absolute floor of max(gamma0, 1) would cap the achievable Newton
    # accuracy at ~eps near convergence, stalling above stat_tol.  A
    # denormal-scale floor keeps the test firing for tiny-but-nonzero
    # gamma0, where a pure-relative tol underflows and every such solve
    # would burn the full iteration budget.
    tol = jnp.maximum(
        max(rel_tol, 10.0 * eps) * gamma0, 100.0 * jnp.finfo(dtype).tiny
    )
    trivial = gamma0 <= jnp.finfo(dtype).tiny

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
        breakdown = beta_next <= 100.0 * eps * jnp.maximum(gamma0, 1.0)

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
    d = d * jnp.where(dn > radius, radius / jnp.maximum(dn, jnp.finfo(dtype).tiny), 1.0)

    iters = final["k"] - 1
    zero_spectrum = iters == 0
    return TRResult(
        step=d,
        on_boundary=~final["interior"],
        iterations=iters,
        min_rayleigh=jnp.where(zero_spectrum, 0.0, final["min_ray"]),
        max_rayleigh=jnp.where(zero_spectrum, 0.0, final["max_ray"]),
    )
