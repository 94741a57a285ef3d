"""Block cyclic reduction for SPD block-tridiagonal systems.

TPU-first alternative to the sequential Thomas scan (block_tridiag.py)
and the SPIKE decomposition: each of the ~log2(N) levels eliminates the
EVEN-indexed blocks with fully BATCHED operations — batched Gauss-Jordan
inverses in one pallas kernel per level plus batched einsums on the MXU
— so the sequential critical path is O(log N) XLA ops instead of O(N)
tiny dependent factorizations.  Cyclic reduction on an SPD matrix is
block Gaussian elimination under an odd-even (nested-dissection)
permutation, so it needs no pivoting; the explicit per-block inverses
are float32, and callers recover float64 through iterative refinement
(``block_tridiag_solve_mp`` backend="cr32" in ops/pallas_tridiag.py).

Like the reference's factorization backends (fact_types.h:9-33,
src/main/fact/), the decomposition is split into ``cr_factor`` (stores
per-level inverses and couplings) and ``cr_resolve`` (rhs reduction down
the levels + back-substitution up), so refinement and multi-rhs solves
reuse the factorization.

Measured motivation (TPU v5e, 2026-08): one batched XLA Cholesky of
(1561, 64, 64) costs ~11 ms and a 1560-step f32 Thomas scan ~23 ms,
while each CR level is ~10 ops on shrinking batches — the whole
factor+solve lands in a few ms at the same sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# VMEM budget for one grid step of the batched-inverse kernel.
_BGJ_VMEM = 8 * 1024 * 1024


def _bgj_kernel(C_ref, M_ref):
    """Batched Gauss-Jordan inverses of a tile of SPD blocks.

    Every extraction is a one-hot multiply + reduce in the patterns the
    Mosaic toolchain compiles cleanly (mirrors the proven
    pallas_chol_tridiag._chol_batched formulation; no scatter, no
    concatenate, no scalar reads, no (B,1,k) lane reductions).
    """
    B, k, _ = C_ref.shape
    ohk = lax.broadcasted_iota(jnp.int32, (k,), 0)
    rows = lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(j, carry):
        A, Binv = carry  # (B, k, k)
        oh = jnp.where(ohk == j, jnp.float32(1), jnp.float32(0))  # (k,)
        colj = jnp.sum(A * oh[None, None, :], axis=2)  # (B, k) col j
        piv = jnp.sum(colj * oh[None, :], axis=1, keepdims=True)  # (B, 1)
        rowA = jnp.sum(A * oh[None, :, None], axis=1)  # (B, k) row j
        rowB = jnp.sum(Binv * oh[None, :, None], axis=1)
        rA = rowA / piv
        rB = rowB / piv
        f = colj - oh[None, :]
        A = A - f[:, :, None] * rA[:, None, :]
        Binv = Binv - f[:, :, None] * rB[:, None, :]
        return A, Binv

    eye = jnp.where(
        rows == cols, jnp.float32(1), jnp.float32(0)
    )  # (k, k)
    eye_b = jnp.broadcast_to(eye[None], (B, k, k))
    _, Minv = lax.fori_loop(
        jnp.int32(0), jnp.int32(k), body, (C_ref[...], eye_b)
    )
    M_ref[...] = Minv


def _gj_small(C):
    """One-hot GJ inverse of a (B, k, k) VALUE (the _bgj_kernel body as
    a function) — the recursion leaf of the blocked kernel."""
    B, k, _ = C.shape
    ohk = lax.broadcasted_iota(jnp.int32, (k,), 0)

    def body(j, carry):
        A, Binv = carry
        oh = jnp.where(ohk == j, jnp.float32(1), jnp.float32(0))
        colj = jnp.sum(A * oh[None, None, :], axis=2)
        piv = jnp.sum(colj * oh[None, :], axis=1, keepdims=True)
        rowA = jnp.sum(A * oh[None, :, None], axis=1)
        rowB = jnp.sum(Binv * oh[None, :, None], axis=1)
        rA = rowA / piv
        rB = rowB / piv
        f = colj - oh[None, :]
        return A - f[:, :, None] * rA[:, None, :], (
            Binv - f[:, :, None] * rB[:, None, :]
        )

    rows = lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, k), 1)
    eye = jnp.where(rows == cols, jnp.float32(1), jnp.float32(0))
    _, Minv = lax.fori_loop(
        jnp.int32(0), jnp.int32(k), body, (C, jnp.broadcast_to(eye[None], C.shape))
    )
    return Minv


_BGJ_LEAF = 16


def _mm(a, b):
    return lax.dot_general(
        a,
        b,
        (((2,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _schur_quadrants(C, inv_half):
    """Quadrants of inv(C) for one 2x2 block-Schur level (stable
    without pivoting: leading principal blocks of an SPD matrix are PD).

        inv([[A, Bm], [Bm^T, D]]) = [[Ai + V Si W,  -V Si],
                                     [-Si W,          Si ]]
        with Ai = inv(A), W = Bm^T Ai, S = D - W Bm, Si = inv(S),
        V = Ai Bm.
    """
    h = C.shape[1] // 2
    A = C[:, :h, :h]
    Bm = C[:, :h, h:]
    D = C[:, h:, h:]
    Ai = inv_half(A)
    W = _mm(jnp.swapaxes(Bm, 1, 2), Ai)  # (B, h, h) = Bm^T Ai
    S = D - _mm(W, Bm)
    Si = inv_half(S)
    V = _mm(Ai, Bm)
    VSi = _mm(V, Si)
    return Ai + _mm(VSi, W), -VSi, -_mm(Si, W), Si


def _bgj_blocked_kernel(C_ref, M_ref, asm_ref):
    """Blocked batched SPD inverse: 2x2 block-Schur levels down to
    ``_BGJ_LEAF`` one-hot-GJ leaves.

    The flat rank-1 GJ sweep reads/writes the FULL (B, k, k) tile k
    times — VMEM-bandwidth-bound (measured ~8 ms for (1561, 64, 64));
    here the sweeps only touch (B, 16, 16) leaves and everything else
    is MXU matmuls, ~an order of magnitude less data movement.

    Quadrants are assembled through REF slice writes (``asm_ref``
    scratch for the inner level, ``M_ref`` for the outer) — in-kernel
    ``concatenate`` SIGABRTs the 2026-08 Mosaic backend.
    """
    k = C_ref.shape[1]

    def inv_leaf(C):
        return _gj_small(C)

    def inv_2level(C):  # k/2-sized input, leaves at k/4
        tl, tr, bl, br = _schur_quadrants(C, inv_leaf)
        h = C.shape[1] // 2
        asm_ref[:, :h, :h] = tl
        asm_ref[:, :h, h:] = tr
        asm_ref[:, h:, :h] = bl
        asm_ref[:, h:, h:] = br
        return asm_ref[...]

    inner = inv_leaf if k <= 2 * _BGJ_LEAF else inv_2level
    tl, tr, bl, br = _schur_quadrants(C_ref[...], inner)
    h = k // 2
    M_ref[:, :h, :h] = tl
    M_ref[:, :h, h:] = tr
    M_ref[:, h:, :h] = bl
    M_ref[:, h:, h:] = br


def _bgj_tile(B: int, k: int) -> int:
    per_block = max(k, 8) * max(k, 128) * 4
    # C tile + M tile + two fori carries + pipeline headroom ~ 8x
    bt = max(1, _BGJ_VMEM // (8 * per_block))
    return min(B, bt)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_gj_inverse(C: Array, interpret=None) -> Array:
    """Inverses of a batch of SPD blocks, (B, k, k) -> (B, k, k) f32.

    Grid-parallel over batch tiles (blocks are independent).  The batch
    is padded to the tile multiple with identity blocks.
    """
    if interpret is None:
        interpret = _default_interpret()
    B, k, _ = C.shape
    C32 = C.astype(jnp.float32)
    bt = B if interpret else _bgj_tile(B, k)
    # keep the in-kernel batch >= 8 sublanes (degenerate leading dims
    # miscompile on the 2026-08 toolchain)
    if not interpret and bt < 8:
        bt = min(8, max(bt, 8))
    T = -(-B // bt)
    Bp = T * bt
    if Bp != B:
        eye = jnp.broadcast_to(jnp.eye(k, dtype=jnp.float32), (Bp - B, k, k))
        C32 = jnp.concatenate([C32, eye], axis=0)
    spec = pl.BlockSpec(
        (bt, k, k), lambda i: (i, i * 0, i * 0), memory_space=pltpu.VMEM
    )
    # blocked Schur kernel for k = 64 (measured 8.0 -> 4.5 ms at
    # (1561, 64, 64); at k = 32 the flat sweep is already faster,
    # 0.9 vs 1.1 ms at (780, 32, 32)); flat one-hot GJ otherwise
    if k == 4 * _BGJ_LEAF:
        M = pl.pallas_call(
            _bgj_blocked_kernel,
            grid=(T,),
            out_shape=jax.ShapeDtypeStruct((Bp, k, k), jnp.float32),
            in_specs=[spec],
            out_specs=spec,
            scratch_shapes=[pltpu.VMEM((bt, k // 2, k // 2), jnp.float32)],
            interpret=interpret,
        )(C32)
    else:
        M = pl.pallas_call(
            _bgj_kernel,
            grid=(T,),
            out_shape=jax.ShapeDtypeStruct((Bp, k, k), jnp.float32),
            in_specs=[spec],
            out_specs=spec,
            interpret=interpret,
        )(C32)
    return M[:B]


# ---------------------------------------------------------------------------
# Cyclic-reduction factor / resolve
# ---------------------------------------------------------------------------


def _pad_odd(D, L, dtype):
    """Append one identity block (zero coupling) when the level size is
    even, so the even/odd split is always clean."""
    n, k, _ = D.shape
    if n % 2 == 1:
        return D, L
    eye = jnp.eye(k, dtype=dtype)[None]
    D = jnp.concatenate([D, eye], axis=0)
    L = jnp.concatenate([L, jnp.zeros((1, k, k), dtype)], axis=0)
    return D, L


def cr_factor(D: Array, L: Array, *, interpret=None, tail_n: int = 1):
    """Factor an SPD block-tridiagonal system by cyclic reduction.

    D: (N, k, k), L: (N-1, k, k) (L[i] couples row i+1 <- col i), both
    promoted to float32.  Returns a list of per-level dicts consumed by
    ``cr_resolve``; level sizes halve until ``tail_n`` blocks remain
    (default: all the way to one block).  With ``tail_n`` > 1 the tail
    factors through the streaming fused Thomas kernel instead — measured
    slightly SLOWER than pure CR at the production sizes (the tail
    factor's sequential in-kernel GJ outweighs the saved level glue),
    so pure CR is the default; the option stays for small-k systems.
    """
    if interpret is None:
        interpret = _default_interpret()
    D = D.astype(jnp.float32)
    L = L.astype(jnp.float32)
    k = D.shape[1]
    levels = []
    while D.shape[0] > max(tail_n, 1):
        n_in = D.shape[0]
        D, L = _pad_odd(D, L, jnp.float32)
        n = D.shape[0]
        m_o = (n - 1) // 2  # odds survive
        m_e = m_o + 1  # evens eliminated
        M_ev = batched_gj_inverse(D[0::2], interpret=interpret)  # (m_e,k,k)
        # couplings around each odd j = 2m+1:
        #   L_left[m]  = L[j-1] = L[0::2][m]   (row j <- col j-1)
        #   L_right[m] = L[j]   = L[1::2][m]   (row j+1 <- col j)
        L_left = L[0::2][:m_o]
        L_right = L[1::2][:m_o]
        Ml = M_ev[:m_o]  # inverse of even j-1
        Mr = M_ev[1 : m_o + 1]  # inverse of even j+1
        Wl = jnp.einsum("mij,mjk->mik", L_left, Ml)  # L[j-1] M_{j-1}
        Wr = jnp.einsum("mji,mjk->mik", L_right, Mr)  # L[j]^T M_{j+1}
        # D'_j = D_j - L_{j-1} M_{j-1} L_{j-1}^T - L_j^T M_{j+1} L_j
        #      = D_j - Wl L_left^T - Wr L_right   (note: NOT L_right^T)
        Dn = (
            D[1::2][:m_o]
            - jnp.einsum("mij,mkj->mik", Wl, L_left)
            - jnp.einsum("mij,mjk->mik", Wr, L_right)
        )
        # new coupling (old j+2 <- old j): -L[j+1] M_{j+1} L[j]
        L_next = L[2::2][: m_o - 1] if m_o > 1 else jnp.zeros(
            (0, k, k), jnp.float32
        )
        Ln = -jnp.einsum(
            "mij,mjk->mik",
            jnp.einsum("mij,mjk->mik", L_next, Mr[: m_o - 1]),
            L_right[: m_o - 1],
        )
        levels.append(
            dict(
                n=n,
                n_in=n_in,
                M_ev=M_ev,
                L_left=L_left,
                L_right=L_right,
                Wl=Wl,
                Wr=Wr,
            )
        )
        D, L = Dn, Ln
    if D.shape[0] == 1:
        root = batched_gj_inverse(D, interpret=interpret)  # (1, k, k)
        tail = None
    else:
        from .pallas_tridiag import block_tridiag_factor_solve_pallas

        n_tail = D.shape[0]
        _, Minv, Lp32 = block_tridiag_factor_solve_pallas(
            D, L, jnp.zeros((n_tail, k, 1), jnp.float32),
            interpret=interpret or None,
        )
        root = None
        tail = dict(Minv=Minv, Lp32=Lp32, interpret=interpret)
    return dict(levels=levels, root=root, tail=tail, k=k)


def cr_resolve(fact, b: Array) -> Array:
    """Solve against a stored cyclic-reduction factorization.

    b: (N, k) or (N, k, r) in any float dtype; computed in float32.
    """
    squeeze = b.ndim == 2
    b3 = b.astype(jnp.float32)
    if squeeze:
        b3 = b3[..., None]
    k = fact["k"]
    r = b3.shape[-1]

    # -- reduction sweep: fold even rhs into the odd system ------------
    stack = []
    for lv in fact["levels"]:
        n = lv["n"]
        if b3.shape[0] < n:  # level was identity-padded
            b3 = jnp.concatenate(
                [b3, jnp.zeros((n - b3.shape[0], k, r), jnp.float32)], axis=0
            )
        m_o = (n - 1) // 2
        b_ev = b3[0::2]
        b_od = b3[1::2][:m_o]
        bn = (
            b_od
            - jnp.einsum("mij,mjr->mir", lv["Wl"], b_ev[:m_o])
            - jnp.einsum("mij,mjr->mir", lv["Wr"], b_ev[1 : m_o + 1])
        )
        stack.append(b_ev)
        b3 = bn

    if fact["tail"] is None:
        x = jnp.einsum("mij,mjr->mir", fact["root"], b3)  # (1, k, r)
    else:
        from .pallas_tridiag import block_tridiag_resolve_pallas

        tail = fact["tail"]
        x = block_tridiag_resolve_pallas(
            tail["Minv"], tail["Lp32"], b3,
            interpret=tail["interpret"] or None,
        )

    # -- back-substitution sweep ---------------------------------------
    for lv, b_ev in zip(reversed(fact["levels"]), reversed(stack)):
        n = lv["n"]
        m_o = (n - 1) // 2
        zero = jnp.zeros((1, k, r), jnp.float32)
        x_l = jnp.concatenate([zero, x], axis=0)  # x_{e-1} per even
        x_r = jnp.concatenate([x, zero], axis=0)  # x_{e+1} per even
        # L into even e: L[e-1] = L_right[p-1] (front-pad), L[e] = L_left[p]
        # (end-pad) — padded entries multiply the zero neighbors anyway.
        Lr_pad = jnp.concatenate(
            [jnp.zeros((1, k, k), jnp.float32), lv["L_right"]], axis=0
        )
        Ll_pad = jnp.concatenate(
            [lv["L_left"], jnp.zeros((1, k, k), jnp.float32)], axis=0
        )
        rhs_e = (
            b_ev
            - jnp.einsum("pij,pjr->pir", Lr_pad, x_l)
            - jnp.einsum("pji,pjr->pir", Ll_pad, x_r)
        )
        x_ev = jnp.einsum("pij,pjr->pir", lv["M_ev"], rhs_e)
        # interleave evens and odds back into level ordering
        xn = jnp.zeros((n, k, r), jnp.float32)
        xn = xn.at[0::2].set(x_ev)
        xn = xn.at[1::2].set(x)
        # drop the identity-padding row so the size matches the parent
        # level's odd count
        x = xn[: lv["n_in"]]

    x = x[: b.shape[0]]
    return x[..., 0] if squeeze else x


def cr_solve(D: Array, L: Array, b: Array, *, interpret=None):
    """Convenience: factor + resolve in float32."""
    return cr_resolve(cr_factor(D, L, interpret=interpret), b)
