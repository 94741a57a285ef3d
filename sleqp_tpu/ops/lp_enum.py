"""Exhaustive vertex enumeration for tiny LPs — the TPU-native answer
to sequential pivoting when the subproblem is small.

The revised simplex (ops/simplex.py) walks a data-dependent pivot chain:
on a TPU each pivot is a handful of microsecond-scale kernels inside a
``lax.while_loop``, so a 10-pivot solve of a (2, 10) Cauchy LP costs
hundreds of sequential kernel launches per SQP iteration — the dominant
cost of batched tiny-NLP solves.  For small row counts the optimal
vertex can instead be found by evaluating **every** basis in parallel:

    min c^T x   s.t.  A x = 0,   lb <= x <= ub        (m rows, N cols)

has at most C(N, m) bases.  For each basis B (a static index table):
dual y solves A_B^T y = c_B; reduced costs r = c - A^T y place every
nonbasic at the bound its sign demands (bounded-variable optimality);
x_B = -A_B^{-1} A_N x_N.  A candidate is valid iff the placement is
dual-feasible (no wrong-signed r on an infinite bound), A_B is
nonsingular, and x_B lies within its bounds; among valid candidates the
lowest objective wins.  The Cauchy LP is always feasible and bounded
with full row rank (the -I logical block), so a valid basis exists.

Everything is a fixed-shape batched tensor op — no while_loop, no
pivot chain, exact f64 vertex solutions (reference parity target:
lp/lpi_types.h solve + basis statuses)."""

from __future__ import annotations

from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np

from ..types import INF_THRESHOLD, BaseStat
from .simplex import OPTIMAL, SimplexResult

Array = jax.Array

# static gate: enumeration is used when C(N, m) stays below this
MAX_CANDIDATES = 4096
MAX_ROWS = 4


def num_candidates(N: int, m: int) -> int:
    from math import comb

    return comb(N, m)


def suitable(N: int, m: int) -> bool:
    return 0 < m <= MAX_ROWS and num_candidates(N, m) <= MAX_CANDIDATES


def _combo_table(N: int, m: int) -> np.ndarray:
    return np.array(list(combinations(range(N), m)), dtype=np.int32)


def _ge_solve(A: Array, b: Array) -> Array:
    """Batched dense solve by unrolled Gaussian elimination with partial
    pivoting: A (..., m, m), b (..., m) with static tiny m.

    Deliberately avoids ``jnp.linalg.solve``: XLA TPU implements
    LuDecomposition only for f32, and these f64 solves must run on-chip
    inside the fused program.  Singular systems produce inf/nan, which
    the caller's residual check discards."""
    m = A.shape[-1]
    M = jnp.concatenate([A, b[..., None]], axis=-1)  # (..., m, m+1)
    rows = jnp.arange(m)
    for i in range(m):
        # partial pivot: strongest remaining row for column i
        col = jnp.abs(M[..., :, i])
        col = jnp.where(rows >= i, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)  # (...,)
        perm = jnp.where(
            rows == i,
            p[..., None],
            jnp.where(p[..., None] == rows, i, rows),
        )  # (..., m)
        M = jnp.take_along_axis(M, perm[..., None], axis=-2)
        piv = M[..., i, :]  # (..., m+1)
        factor = M[..., :, i] / piv[..., i : i + 1]  # (..., m)
        factor = jnp.where(rows > i, factor, 0.0)
        M = M - factor[..., None] * piv[..., None, :]
    # back substitution (U x = y), unrolled
    x = jnp.zeros_like(b)
    for i in reversed(range(m)):
        acc = M[..., i, m] - jnp.sum(M[..., i, :m] * x, axis=-1)
        xi = acc / M[..., i, i]
        x = x.at[..., i].set(xi)
    return x


def solve_enum(
    A: Array,
    c: Array,
    lb: Array,
    ub: Array,
    tol: float | None = None,
) -> SimplexResult:
    """Solve the box LP by parallel basis enumeration (see module doc)."""
    m, N = A.shape
    dtype = A.dtype
    if tol is None:
        # dtype-aware: 1e-9 in f64; ~50 eps in f32 (a fixed 1e-9 would
        # reject every candidate's residual check in single precision)
        tol = max(1e-9, 50.0 * float(jnp.finfo(dtype).eps))
    idx = jnp.asarray(_combo_table(N, m))  # (K, m) static
    K = idx.shape[0]

    finite_lb = lb > -INF_THRESHOLD
    finite_ub = ub < INF_THRESHOLD

    # A_B: (K, m, m) with A_B[k][:, i] = A[:, idx[k, i]]
    AB = jnp.transpose(A.T[idx], (0, 2, 1))
    cB = c[idx]  # (K, m)

    # duals: A_B^T y = c_B
    y = _ge_solve(jnp.transpose(AB, (0, 2, 1)), cB)
    r = c[None, :] - y @ A  # (K, N)

    scale = 1.0 + jnp.abs(c)[None, :]
    pos = r > tol * scale
    neg = r < -tol * scale
    # nonbasic placement by reduced-cost sign; zero-r rests at any
    # finite bound (or 0 for free columns)
    v = jnp.where(
        pos,
        lb[None, :],
        jnp.where(
            neg,
            ub[None, :],
            jnp.where(finite_lb[None, :], lb[None, :], jnp.where(finite_ub[None, :], ub[None, :], 0.0)),
        ),
    )
    dual_ok = ~jnp.any(
        (pos & ~finite_lb[None, :]) | (neg & ~finite_ub[None, :]), axis=1
    )

    # zero out basic positions in the placement
    basic_mask = jnp.zeros((K, N), bool)
    basic_mask = basic_mask.at[jnp.arange(K)[:, None], idx].set(True)
    v = jnp.where(basic_mask, 0.0, v)

    rhs = -(v @ A.T)  # (K, m)
    xB = _ge_solve(AB, rhs)  # (K, m)

    lbB = lb[idx]
    ubB = ub[idx]
    # tolerance scale from FINITE bounds only (the +-1e20 infinity
    # sentinel would blow the scale up to 1e11, passing any violation)
    sB = 1.0 + jnp.maximum(
        jnp.where(lbB > -INF_THRESHOLD, jnp.abs(lbB), 0.0),
        jnp.where(ubB < INF_THRESHOLD, jnp.abs(ubB), 0.0),
    )
    primal_ok = jnp.all(
        (xB >= lbB - tol * sB) & (xB <= ubB + tol * sB), axis=1
    )
    finite_ok = (
        jnp.all(jnp.isfinite(xB), axis=1)
        & jnp.all(jnp.isfinite(y), axis=1)
        & jnp.all(jnp.isfinite(r), axis=1)
    )
    # a (near-)singular A_B can pass jnp.linalg.solve with large finite
    # garbage — verify the basis by its actual solve residuals
    ab_scale = 1.0 + jnp.max(jnp.abs(AB), axis=(1, 2))
    dual_resid = jnp.max(
        jnp.abs(jnp.einsum("kij,ki->kj", AB, y) - cB), axis=1
    )
    primal_resid = jnp.max(
        jnp.abs(jnp.einsum("kij,kj->ki", AB, xB) - rhs), axis=1
    )
    x_scale = 1.0 + jnp.max(jnp.abs(xB), axis=1)
    y_scale = 1.0 + jnp.max(jnp.abs(y), axis=1) + jnp.max(jnp.abs(cB), axis=1)
    resid_ok = (dual_resid <= tol * ab_scale * y_scale) & (
        primal_resid <= tol * ab_scale * x_scale
    )
    valid = dual_ok & primal_ok & finite_ok & resid_ok

    obj = jnp.sum(v * c[None, :], axis=1) + jnp.sum(xB * cB, axis=1)
    obj_masked = jnp.where(valid, obj, jnp.inf)
    k_best = jnp.argmin(obj_masked)

    x = v[k_best].at[idx[k_best]].set(xB[k_best])
    status = jnp.where(
        pos[k_best],
        BaseStat.LOWER,
        jnp.where(
            neg[k_best],
            BaseStat.UPPER,
            jnp.where(
                finite_lb,
                BaseStat.LOWER,
                jnp.where(finite_ub, BaseStat.UPPER, BaseStat.ZERO),
            ),
        ),
    ).astype(jnp.int8)
    status = status.at[idx[k_best]].set(jnp.int8(BaseStat.BASIC))

    # 1-norm condition estimate of the winning basis (inverse via the
    # same LU-free elimination — jnp.linalg.inv would not compile on TPU)
    ABb = AB[k_best]
    eye = jnp.eye(m, dtype=dtype)
    ABinv = jax.vmap(lambda e: _ge_solve(ABb, e))(eye).T
    cond = jnp.sum(jnp.abs(ABb), axis=0).max() * jnp.sum(
        jnp.abs(ABinv), axis=0
    ).max()

    return SimplexResult(
        x=x,
        duals=y[k_best],
        reduced_costs=r[k_best],
        status=status,
        basis=idx[k_best].astype(jnp.int32),
        obj=obj[k_best],
        state=jnp.asarray(OPTIMAL, jnp.int32),
        iterations=jnp.asarray(1, jnp.int32),
        condition=cond.astype(dtype),
    )
