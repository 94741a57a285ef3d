"""Block-tridiagonal SPD solves: sequential Thomas and Schur/SPIKE variants.

The reference factors sparse KKT systems with external libraries
(CHOLMOD/MA57/MUMPS behind src/main/fact/).  The TPU-native equivalent for
the structured problems that actually get large — banded and multistage
(OCP) KKT systems (SURVEY.md §5.7, BASELINE configs 3-4) — is a *block*
factorization:

* ``block_thomas``: one `lax.scan` block-LDL^T recursion
  (C_i = D_i - L_{i-1} C_{i-1}^{-1} L_{i-1}^T), O(N k^3) work, O(N) depth.
  Each block step is dense k x k linear algebra on the MXU.

* ``schur_block_tridiag_solve``: one-level domain decomposition (SPIKE):
  every c-th block is a separator; the interior chunks between separators
  factor **in parallel** (vmap), contribute Schur terms to the (small)
  separator block-tridiagonal system, which is solved sequentially, and
  interiors back-substitute in parallel.  Depth drops from O(N) to
  O(N/P + P); across a device mesh the chunk dimension shards with
  `shard_map` (parallel/schur.py) — the "Schur-complement KKT across
  hosts with psum" configuration of BASELINE.json.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_factor, cho_solve

Array = jax.Array


def block_thomas_factor(D: Array, L: Array):
    """Factor an SPD block-tridiagonal matrix.

    D: (N, k, k) diagonal blocks; L: (N-1, k, k) sub-diagonal blocks
    (row i+1, col i).  Returns (chols, Ls) with chols the Cholesky factors
    of the Schur-complemented diagonal blocks.
    """
    N, k, _ = D.shape

    def step(carry, inputs):
        chol_prev = carry
        D_i, L_im1 = inputs
        # C_i = D_i - L_{i-1} C_{i-1}^{-1} L_{i-1}^T
        W = cho_solve((chol_prev, True), L_im1.T)  # C^{-1} L^T
        C_i = D_i - L_im1 @ W
        chol_i = cho_factor(C_i, lower=True)[0]
        return chol_i, chol_i

    chol0 = cho_factor(D[0], lower=True)[0]
    _, chols_rest = lax.scan(step, chol0, (D[1:], L))
    chols = jnp.concatenate([chol0[None], chols_rest], axis=0)
    return chols


def block_thomas_solve(chols: Array, L: Array, b: Array) -> Array:
    """Solve with factors from block_thomas_factor.

    b: (N, k) or (N, k, nrhs).
    """
    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]
    N = b.shape[0]

    # forward: y_i = b_i - L_{i-1} C_{i-1}^{-1} y_{i-1}
    def fwd(carry, inputs):
        y_prev_solved = carry  # C_{i-1}^{-1} y_{i-1}
        b_i, L_im1, chol_i = inputs
        y_i = b_i - L_im1 @ y_prev_solved
        solved = cho_solve((chol_i, True), y_i)
        return solved, solved

    y0 = cho_solve((chols[0], True), b[0])
    _, ys_rest = lax.scan(fwd, y0, (b[1:], L, chols[1:]))
    ys = jnp.concatenate([y0[None], ys_rest], axis=0)  # C_i^{-1} y_i

    # backward: x_i = C_i^{-1}(y_i - L_i^T x_{i+1}) = ys_i - C_i^{-1} L_i^T x_{i+1}
    def bwd(carry, inputs):
        x_next = carry
        ys_i, L_i, chol_i = inputs
        x_i = ys_i - cho_solve((chol_i, True), L_i.T @ x_next)
        return x_i, x_i

    xN = ys[-1]
    _, xs_rest = lax.scan(
        bwd, xN, (ys[:-1], L, chols[:-1]), reverse=True
    )
    x = jnp.concatenate([xs_rest, xN[None]], axis=0)
    return x[..., 0] if squeeze else x


def block_tridiag_solve(D: Array, L: Array, b: Array) -> Array:
    """Convenience: factor + solve."""
    chols = block_thomas_factor(D, L)
    return block_thomas_solve(chols, L, b)


# ---------------------------------------------------------------------------
# One-level Schur / SPIKE decomposition
# ---------------------------------------------------------------------------


def _chunk_views(D, L, b, P, c):
    """Split blocks into P interior chunks of length c-1 + P-1 separators.

    Layout: [chunk_0 | sep_0 | chunk_1 | sep_1 | ... | chunk_{P-1}],
    N = P*c - 1 with chunk length c-1.
    """
    N, k, _ = D.shape
    sep_idx = jnp.arange(1, P) * c - 1  # (P-1,)
    # interior chunk p covers blocks [p*c, p*c + c-1)
    chunk_start = jnp.arange(P) * c

    def gather_chunk(start):
        ids = start + jnp.arange(c - 1)
        D_c = D[ids]
        L_c = L[ids[:-1]]  # couplings inside the chunk
        b_c = b[ids]
        return D_c, L_c, b_c

    D_ch, L_ch, b_ch = jax.vmap(gather_chunk)(chunk_start)
    return D_ch, L_ch, b_ch, sep_idx, chunk_start


def schur_block_tridiag_solve(D: Array, L: Array, b: Array, num_chunks: int):
    """Domain-decomposed solve; requires N = num_chunks * c - 1 for integer c.

    The interior factorizations and back-substitutions vmap across chunks;
    the separator system is a (P-1)-block tridiagonal solved sequentially.
    """
    N, k, _ = D.shape
    P = num_chunks
    if (N + 1) % P != 0:
        raise ValueError(f"N+1={N + 1} must be divisible by num_chunks={P}")
    c = (N + 1) // P
    if c < 2:
        raise ValueError("chunks must contain at least one interior block")

    D_ch, L_ch, b_ch, sep_idx, chunk_start = _chunk_views(D, L, b, P, c)

    # couplings: separator j sits between chunk j and chunk j+1
    #   E_j = L[sep_idx_j - 1]  couples sep j to the LAST block of chunk j
    #         (row sep, col last-interior)
    #   F_j = L[sep_idx_j]      couples chunk j+1's FIRST block to sep j
    #         (row first-interior of chunk j+1, col sep)
    E = L[sep_idx - 1]  # (P-1, k, k)
    F = L[sep_idx]  # (P-1, k, k)

    # ---- parallel interior factorization + solves ---------------------
    chols_ch = jax.vmap(block_thomas_factor)(D_ch, L_ch)

    def interior_solve(chols, Lc, rhs):
        return block_thomas_solve(chols, Lc, rhs)

    # rhs for interiors: b plus coupling columns at first/last positions
    nin = c - 1
    # u = T^{-1} b  (interior solve of the raw rhs)
    u = jax.vmap(interior_solve)(chols_ch, L_ch, b_ch)  # (P, nin, k)

    # left coupling column: separator j-1 -> first block of chunk j via F_{j-1}
    # right coupling column: separator j -> last block of chunk j via E_j^T
    def coupling_rhs_left(Fj):
        rhs = jnp.zeros((nin, k, k), dtype=D.dtype)
        return rhs.at[0].set(Fj)

    def coupling_rhs_right(Ej):
        rhs = jnp.zeros((nin, k, k), dtype=D.dtype)
        return rhs.at[-1].set(Ej.T)

    # chunk j has left separator j-1 (for j>=1) and right separator j (j<P-1)
    F_pad = jnp.concatenate([jnp.zeros((1, k, k), D.dtype), F], axis=0)  # (P,k,k)
    E_pad = jnp.concatenate([E, jnp.zeros((1, k, k), D.dtype)], axis=0)  # (P,k,k)

    VL = jax.vmap(lambda ch, Lc, Fj: interior_solve(ch, Lc, coupling_rhs_left(Fj)))(
        chols_ch, L_ch, F_pad
    )  # (P, nin, k, k): T^{-1} [F at first]
    VR = jax.vmap(lambda ch, Lc, Ej: interior_solve(ch, Lc, coupling_rhs_right(Ej)))(
        chols_ch, L_ch, E_pad
    )  # (P, nin, k, k): T^{-1} [E^T at last]

    # ---- separator Schur system ---------------------------------------
    # Row of separator j:  E_j x_last(chunk j) + D_sep_j s_j
    #                      + F_j^T x_first(chunk j+1) = b_sep_j
    # with x(chunk j) = u_j - VL_j s_{j-1} - VR_j s_j  (interior elimination)
    D_sep = D[sep_idx]  # (P-1, k, k)
    b_sep = b[sep_idx]  # (P-1, k)

    # diagonal: D_sep_j - E_j VR_j[last] - F_j^T VL_{j+1}[first]
    S_diag = (
        D_sep
        - jnp.einsum("jab,jbc->jac", E, VR[:-1, -1])
        - jnp.einsum("jba,jbc->jac", F, VL[1:, 0])
    )
    # sub-diagonal (separator j vs j-1): -E_j VL_j[last]  (through chunk j)
    S_sub = -jnp.einsum("jab,jbc->jac", E[1:], VL[1:-1, -1])
    # rhs: b_sep_j - E_j u_j[last] - F_j^T u_{j+1}[first]
    S_rhs = (
        b_sep
        - jnp.einsum("jab,jb->ja", E, u[:-1, -1])
        - jnp.einsum("jba,jb->ja", F, u[1:, 0])
    )

    s = block_tridiag_solve(S_diag, S_sub, S_rhs)  # (P-1, k)

    # ---- parallel back-substitution -----------------------------------
    s_left = jnp.concatenate([jnp.zeros((1, k), D.dtype), s], axis=0)  # (P, k)
    s_right = jnp.concatenate([s, jnp.zeros((1, k), D.dtype)], axis=0)  # (P, k)
    x_ch = (
        u
        - jnp.einsum("pnab,pb->pna", VL, s_left)
        - jnp.einsum("pnab,pb->pna", VR, s_right)
    )  # (P, nin, k)

    # ---- scatter back into the global ordering ------------------------
    x = jnp.zeros((N, k), dtype=D.dtype)
    ids = (chunk_start[:, None] + jnp.arange(nin)[None, :]).reshape(-1)
    x = x.at[ids].set(x_ch.reshape(-1, k))
    x = x.at[sep_idx].set(s)
    return x


# ---------------------------------------------------------------------------
# SPIKE factor / resolve split (factor once, solve many right-hand sides)
# ---------------------------------------------------------------------------


def schur_factor(D: Array, L: Array, num_chunks: int):
    """Factor the SPIKE decomposition once for repeated solves.

    Same decomposition as ``schur_block_tridiag_solve`` but split into a
    factor object + ``schur_resolve`` (the reference's factor-once /
    solve-many split, fact_types.h:9-33) so mixed-precision iterative
    refinement can reuse the (parallel, vmapped) interior factorizations
    and the small separator factorization instead of re-factoring per
    residual correction.  Requires N = num_chunks * c - 1.
    """
    N, k, _ = D.shape
    P = num_chunks
    if (N + 1) % P != 0:
        raise ValueError(f"N+1={N + 1} must be divisible by num_chunks={P}")
    c = (N + 1) // P
    if c < 2:
        raise ValueError("chunks must contain at least one interior block")

    D_ch, L_ch, _, sep_idx, chunk_start = _chunk_views(
        D, L, jnp.zeros((N, k), D.dtype), P, c
    )
    E = L[sep_idx - 1]
    F = L[sep_idx]

    chols_ch = jax.vmap(block_thomas_factor)(D_ch, L_ch)
    nin = c - 1

    def coupling_rhs_left(Fj):
        rhs = jnp.zeros((nin, k, k), dtype=D.dtype)
        return rhs.at[0].set(Fj)

    def coupling_rhs_right(Ej):
        rhs = jnp.zeros((nin, k, k), dtype=D.dtype)
        return rhs.at[-1].set(Ej.T)

    F_pad = jnp.concatenate([jnp.zeros((1, k, k), D.dtype), F], axis=0)
    E_pad = jnp.concatenate([E, jnp.zeros((1, k, k), D.dtype)], axis=0)
    VL = jax.vmap(
        lambda ch, Lc, Fj: block_thomas_solve(ch, Lc, coupling_rhs_left(Fj))
    )(chols_ch, L_ch, F_pad)
    VR = jax.vmap(
        lambda ch, Lc, Ej: block_thomas_solve(ch, Lc, coupling_rhs_right(Ej))
    )(chols_ch, L_ch, E_pad)

    S_diag = (
        D[sep_idx]
        - jnp.einsum("jab,jbc->jac", E, VR[:-1, -1])
        - jnp.einsum("jba,jbc->jac", F, VL[1:, 0])
    )
    S_sub = -jnp.einsum("jab,jbc->jac", E[1:], VL[1:-1, -1])
    sep_chols = block_thomas_factor(S_diag, S_sub)

    return dict(
        chols_ch=chols_ch,
        L_ch=L_ch,
        VL=VL,
        VR=VR,
        E=E,
        F=F,
        sep_chols=sep_chols,
        S_sub=S_sub,
        sep_idx=sep_idx,
        chunk_start=chunk_start,
        shape=(N, k, P, c),
    )


def spike_block_tridiag_solve(
    D: Array, L: Array, b: Array, num_chunks: int
) -> Array:
    """One-shot SPIKE solve with identity padding to the chunk layout
    (any dtype).  Sequential depth ~ N/P + P instead of N; interiors
    factor/substitute in parallel."""
    N, k, _ = D.shape
    P = num_chunks
    c = -(-(N + 1) // P)
    c = max(c, 2)
    Np = P * c - 1
    pad = Np - N
    if pad:
        eye = jnp.broadcast_to(jnp.eye(k, dtype=D.dtype), (pad, k, k))
        D = jnp.concatenate([D, eye], axis=0)
        L = jnp.concatenate([L, jnp.zeros((pad, k, k), D.dtype)], axis=0)
        b = jnp.concatenate(
            [b, jnp.zeros((pad,) + b.shape[1:], b.dtype)], axis=0
        )
    fact = schur_factor(D, L, P)
    return schur_resolve(fact, b)[:N]


def schur_resolve(fact, b: Array) -> Array:
    """Solve A x = b with a stored ``schur_factor`` decomposition.

    b: (N, k) or (N, k, nrhs).  The interior solves and
    back-substitutions vmap across chunks; only the (P-1)-block
    separator substitution is sequential.
    """
    N, k, P, c = fact["shape"]
    nin = c - 1
    chunk_start = fact["chunk_start"]
    sep_idx = fact["sep_idx"]
    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]

    b_ch = jax.vmap(lambda start: b[start + jnp.arange(nin)])(chunk_start)
    u = jax.vmap(block_thomas_solve)(fact["chols_ch"], fact["L_ch"], b_ch)

    S_rhs = (
        b[sep_idx]
        - jnp.einsum("jab,jbr->jar", fact["E"], u[:-1, -1])
        - jnp.einsum("jba,jbr->jar", fact["F"], u[1:, 0])
    )
    s = block_thomas_solve(fact["sep_chols"], fact["S_sub"], S_rhs)

    zrow = jnp.zeros((1,) + s.shape[1:], b.dtype)
    s_left = jnp.concatenate([zrow, s], axis=0)
    s_right = jnp.concatenate([s, zrow], axis=0)
    x_ch = (
        u
        - jnp.einsum("pnab,pbr->pnar", fact["VL"], s_left)
        - jnp.einsum("pnab,pbr->pnar", fact["VR"], s_right)
    )

    x = jnp.zeros(b.shape, dtype=b.dtype)
    ids = (chunk_start[:, None] + jnp.arange(nin)[None, :]).reshape(-1)
    x = x.at[ids].set(x_ch.reshape((-1,) + b.shape[1:]))
    x = x.at[sep_idx].set(s)
    return x[..., 0] if squeeze else x


# ---------------------------------------------------------------------------
# Symmetric-indefinite (quasi-definite) variant
# ---------------------------------------------------------------------------


def block_thomas_factor_lu(D: Array, L: Array):
    """Factor a *symmetric indefinite* block-tridiagonal matrix via the
    same Schur recursion with LU pivoting per block.

    Intended for regularized (quasi-definite) KKT systems
    [H + rho I, J^T; J, -delta I] interleaved per stage (banded.py),
    where the Cholesky recursion of ``block_thomas_factor`` does not
    apply.  Returns (lus, pivs) of the Schur-complemented diagonals.
    """
    from jax.scipy.linalg import lu_factor, lu_solve

    N, k, _ = D.shape

    def step(carry, inputs):
        lu_prev, piv_prev = carry
        D_i, L_im1 = inputs
        W = lu_solve((lu_prev, piv_prev), L_im1.T)  # C^{-1} L^T
        C_i = D_i - L_im1 @ W
        lu_i, piv_i = lu_factor(C_i)
        return (lu_i, piv_i), (lu_i, piv_i)

    lu0, piv0 = lu_factor(D[0])
    _, (lus_rest, pivs_rest) = lax.scan(step, (lu0, piv0), (D[1:], L))
    lus = jnp.concatenate([lu0[None], lus_rest], axis=0)
    pivs = jnp.concatenate([piv0[None], pivs_rest], axis=0)
    return lus, pivs


def block_thomas_solve_lu(lus: Array, pivs: Array, L: Array, b: Array) -> Array:
    """Solve with factors from ``block_thomas_factor_lu`` (b: (N, k))."""
    from jax.scipy.linalg import lu_solve

    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]

    def fwd(carry, inputs):
        y_prev_solved = carry
        b_i, L_im1, lu_i, piv_i = inputs
        y_i = b_i - L_im1 @ y_prev_solved
        solved = lu_solve((lu_i, piv_i), y_i)
        return solved, solved

    y0 = lu_solve((lus[0], pivs[0]), b[0])
    _, ys_rest = lax.scan(fwd, y0, (b[1:], L, lus[1:], pivs[1:]))
    ys = jnp.concatenate([y0[None], ys_rest], axis=0)

    def bwd(carry, inputs):
        x_next = carry
        ys_i, L_i, lu_i, piv_i = inputs
        x_i = ys_i - lu_solve((lu_i, piv_i), L_i.T @ x_next)
        return x_i, x_i

    xN = ys[-1]
    _, xs_rest = lax.scan(bwd, xN, (ys[:-1], L, lus[:-1], pivs[:-1]), reverse=True)
    x = jnp.concatenate([xs_rest, xN[None]], axis=0)
    return x[..., 0] if squeeze else x


def block_tridiag_solve_lu(D: Array, L: Array, b: Array) -> Array:
    """Convenience: LU factor + solve (symmetric indefinite blocks)."""
    lus, pivs = block_thomas_factor_lu(D, L)
    return block_thomas_solve_lu(lus, pivs, L, b)
