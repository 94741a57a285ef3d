"""Batched Cholesky block-Thomas Pallas kernels.

The mixed-precision structured-KKT path factors SPD block-tridiagonal
systems in float32 (ops/pallas_tridiag.block_tridiag_solve_mp).  The XLA
implementations bottom out in CholeskyDecomposition / TriangularSolve
ops, which TPUs execute at a tiny fraction of peak for k = 32..64 blocks
(~9 GFLOP/s measured end-to-end at n = 10240 — the whole solve is
primitive-overhead).  These kernels implement the same recursions as
ops/block_tridiag.block_thomas_factor/solve as straight-line VPU/MXU
code inside ONE pallas_call each:

* Cholesky: right-looking, k unrolled rank-1 downdates (exact f32).
* Triangular solves: k unrolled substitution steps (exact f32 — the
  refinement loop in block_tridiag_solve_mp requires true-f32 factors;
  matmuls that hit the MXU use Precision.HIGHEST).
* The batch dimension P (SPIKE chunks) vectorizes every step, so the
  sequential depth is the chunk length, not N.

Unlike ops/pallas_tridiag._factor_solve_kernel (explicit Gauss-Jordan
block inverses), these are backward stable per step — safe for the
(1/delta)-scaled couplings of the condensed banded KKT system.

Numerics match block_thomas_factor/solve exactly (same recursion, same
factor object semantics: the stored blocks are the Cholesky factors of
the Schur-complemented diagonals).  reference: the factor-once /
solve-many split of fact_types.h:9-33 over src/main/fact/.

STATUS (r4): verified bit-exact against the XLA path in interpret mode
(tests/test_pallas_tridiag.py) but NOT yet the default on hardware —
the remote TPU compile service crashes (HTTP 500, tpu_compile_helper
exit 1, no diagnostics surfaced) on these kernels while compiling
near-identical bisect kernels fine; local compilation is blocked by a
client/terminal libtpu version mismatch.  Bisection so far: trivial
elementwise, fori+iota/where/reduce/rsqrt singletons, 4D refs with
pl.ds dynamic read/write, aliasing, nested fori with tuple carries and
HIGHEST-precision dot_general all compile individually; adding the
lane-reduction (P,k)->(P,1) + broadcast-multiply sequence of the
Cholesky body reproduces the crash.  Revisit when the toolchain rolls
— the payoff stands (XLA's batched Cholesky/TriangularSolve measured
465/671 ms where the whole scan needs 6 ms).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# unrolled-substitution kernels get large beyond this block size (and the
# XLA batched path catches up anyway)
MAX_CHOL_BLOCK = 128

# tracing the k-unrolled substitution chains through jit->pallas->fori
# exceeds CPython's default recursion limit at k >= ~32
if sys.getrecursionlimit() < 10_000:
    sys.setrecursionlimit(10_000)


def _chol_batched(C: Array) -> Array:
    """Right-looking Cholesky of (P, k, k) SPD blocks: k rank-1
    downdates via fori_loop, column extraction by one-hot reduction
    (no unrolling — k-unrolled chains blow the trace recursion limit —
    and no dynamic lane slicing, which Mosaic restricts)."""
    P, k, _ = C.shape
    rows = lax.broadcasted_iota(jnp.int32, (k,), 0)

    def body(j, carry):
        A, Lf = carry
        # select, not astype: Mosaic's bool->float convert rule recurses;
        # keep every intermediate >= 2-D (1-D rsqrt inside the nested
        # fori crashed the backend compiler)
        oh = jnp.where(rows == j, jnp.float32(1), jnp.float32(0))  # (k,)
        dcol = jnp.sum(A * oh[None, None, :], axis=2)  # (P, k) col j
        diag = jnp.sum(dcol * oh[None, :], axis=1, keepdims=True)  # (P, 1)
        d = lax.rsqrt(diag)
        lower = jnp.where(
            rows[None, :] >= j, jnp.float32(1), jnp.float32(0)
        )  # (1, k)
        col = dcol * d * lower
        Lf = Lf + col[:, :, None] * oh[None, None, :]
        A = A - col[:, :, None] * col[:, None, :]
        return A, Lf

    _, Lf = lax.fori_loop(
        jnp.int32(0), jnp.int32(k), body, (C, jnp.zeros_like(C))
    )
    return Lf


def _trisolve_lower_t(L: Array, B: Array) -> Array:
    """Solve Y L^T = B (i.e. L y^T = b^T per row) for lower-triangular
    (P, k, k) L, with the rhs in TRANSPOSED layout B (P, r, k) — rows
    are right-hand sides.  The (r, k) layout tiles as (8, 128) sublanes
    x lanes instead of padding a k x 1 column to k x 128."""
    P, k, _ = L.shape
    cols = lax.broadcasted_iota(jnp.int32, (k,), 0)

    def body(j, Y):
        oh = jnp.where(cols == j, jnp.float32(1), jnp.float32(0))  # (k,)
        lj = jnp.sum(L * oh[None, :, None], axis=1)  # (P, k): row j of L
        diag = jnp.sum(lj * oh[None, :], axis=1, keepdims=True)  # (P, 1)
        acc = jnp.sum(lj[:, None, :] * Y, axis=2)  # (P, r)
        bj = jnp.sum(B * oh[None, None, :], axis=2)  # (P, r)
        yj = (bj - acc) / diag
        return Y + yj[:, :, None] * oh[None, None, :]

    return lax.fori_loop(jnp.int32(0), jnp.int32(k), body, jnp.zeros_like(B))


def _trisolve_upper_tt(L: Array, B: Array) -> Array:
    """Solve X L = B (i.e. L^T x^T = b^T per row), transposed layout."""
    P, k, _ = L.shape
    cols = lax.broadcasted_iota(jnp.int32, (k,), 0)

    def body(jj, X):
        j = jnp.asarray(k - 1, jnp.int32) - jj
        oh = jnp.where(cols == j, jnp.float32(1), jnp.float32(0))
        ltj = jnp.sum(L * oh[None, None, :], axis=2)  # (P, k): col j of L
        diag = jnp.sum(ltj * oh[None, :], axis=1, keepdims=True)  # (P, 1)
        acc = jnp.sum(ltj[:, None, :] * X, axis=2)  # (P, r)
        bj = jnp.sum(B * oh[None, None, :], axis=2)
        xj = (bj - acc) / diag
        return X + xj[:, :, None] * oh[None, None, :]

    return lax.fori_loop(jnp.int32(0), jnp.int32(k), body, jnp.zeros_like(B))


def _cho_solve_t(Lc: Array, B: Array) -> Array:
    """C^-1 applied to transposed-layout rhs: solves X C = B for
    symmetric C = L L^T, B (P, r, k)."""
    return _trisolve_upper_tt(Lc, _trisolve_lower_t(Lc, B))


def _hi_dot_nt(a, b):
    """Batched a @ b^T (contract both last dims) at true-f32 precision."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _read(ref, i):
    return ref[:, pl.ds(i, 1)][:, 0]


def _write(ref, i, val):
    ref[:, pl.ds(i, 1)] = val[:, None]


def _factor_kernel(D_ref, Lp_ref, chol_ref):
    """Batched Thomas factorization.

    D: (P, c, k, k) diagonals; Lp: (P, c, k, k) with Lp[:, i] = L[:, i-1]
    (Lp[:, 0] = 0).  Writes the Cholesky factors of the Schur-
    complemented diagonals to chol (P, c, k, k) — which may alias D
    (each D block is read exactly once, before its slot is written).
    """
    c = D_ref.shape[1]

    ch0 = _chol_batched(D_ref[:, 0])
    chol_ref[:, 0] = ch0

    def step(i, ch_prev):
        i = jnp.asarray(i, jnp.int32)
        Li = _read(Lp_ref, i)  # (P, k, k) = L[i-1]
        # W^T = L_i C_prev^-1  (transposed-layout solve, rows = rhs)
        Wt = _cho_solve_t(ch_prev, Li)
        # C_i = D_i - L_i C_prev^-1 L_i^T = D_i - W^T L_i^T
        Ci = _read(D_ref, i) - _hi_dot_nt(Wt, Li)
        chi = _chol_batched(Ci)
        _write(chol_ref, i, chi)
        return chi

    lax.fori_loop(jnp.int32(1), jnp.int32(c), step, ch0)


def _solve_kernel(chol_ref, Lp_ref, b_ref, x_ref):
    """Both substitution sweeps against stored factors.

    b, x: (P, c, r, k) — TRANSPOSED rhs layout (rows are right-hand
    sides), so an r=1 solve tiles as (8, 128) instead of padding a
    k x 1 column to k x 128.  x may alias b.
    """
    c = chol_ref.shape[1]

    # forward: solved_i = C_i^-1 (b_i - L_{i-1} solved_{i-1})
    s0 = _cho_solve_t(chol_ref[:, 0], b_ref[:, 0])
    x_ref[:, 0] = s0

    def fwd(i, s_prev):
        i = jnp.asarray(i, jnp.int32)
        Li = _read(Lp_ref, i)
        # rows: y = b - s_prev L^T
        yi = _read(b_ref, i) - _hi_dot_nt(s_prev, Li)
        si = _cho_solve_t(_read(chol_ref, i), yi)
        _write(x_ref, i, si)
        return si

    s_last = lax.fori_loop(jnp.int32(1), jnp.int32(c), fwd, s0)

    # backward: x_i = solved_i - C_i^-1 L_i^T x_{i+1}
    def bwd(jj, x_next):
        # keep index arithmetic in i32: python ints promote to i64 under
        # jax_enable_x64 and Mosaic rejects mixed-width arith
        i = jnp.asarray(c - 2, jnp.int32) - jj
        Lip1 = _read(Lp_ref, i + 1)  # = L[i]
        # rows: (L^T x)^T = x_next L
        rhs = jax.lax.dot_general(
            x_next,
            Lip1,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        corr = _cho_solve_t(_read(chol_ref, i), rhs)
        xi = _read(x_ref, i) - corr
        _write(x_ref, i, xi)
        return xi

    lax.fori_loop(jnp.int32(0), jnp.int32(c - 1), bwd, s_last)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_sub(L: Array) -> Array:
    """(P, c-1, k, k) sub-diagonals -> (P, c, k, k) with Lp[:, 0] = 0."""
    P, cm1, k, _ = L.shape
    return jnp.concatenate(
        [jnp.zeros((P, 1, k, k), L.dtype), L], axis=1
    )


# Mosaic's scoped-VMEM footprint for these kernels measures ~9-10x one
# (pt, c, k, k) operand (loop carries + double buffering); keep the
# per-grid-step estimate safely under the ~16 MB budget.
_VMEM_BUDGET = 11 * 1024 * 1024
_VMEM_OVERHEAD = 10


def _chunk_tile(P: int, c: int, k: int, r: int = 0) -> int:
    """Largest divisor tile pt of the chunk axis P whose estimated
    scoped-VMEM footprint fits; chunks are independent, so the grid
    iterates tiles sequentially with no cross-step state."""
    blk = max(k, 8) * max(k, 128) * 4
    rhs = max(r, 8) * max(k, 128) * 4 if r else 0
    per_chunk = _VMEM_OVERHEAD * c * (blk + rhs)
    pt = P
    while pt > 1 and pt * per_chunk > _VMEM_BUDGET:
        # P is not always a power of two; find the next smaller divisor
        pt -= 1
        while pt > 1 and P % pt:
            pt -= 1
    return max(pt, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _factor_call(D32, Lp32, interpret):
    P, c, k, _ = D32.shape
    pt = P if interpret else _chunk_tile(P, c, k)
    # i * 0 keeps every index i32 (python 0 literals promote to i64
    # under jax_enable_x64 and Mosaic rejects the mixed-width return)
    spec = pl.BlockSpec(
        (pt, c, k, k), lambda i: (i, i * 0, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _factor_kernel,
        grid=(P // pt,),
        out_shape=jax.ShapeDtypeStruct(D32.shape, jnp.float32),
        in_specs=[spec] * 2,
        out_specs=spec,
        input_output_aliases={0: 0},  # chol overwrites D in place
        interpret=interpret,
    )(D32, Lp32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _solve_call(chols, Lp32, b32, interpret):
    P, c, k, _ = chols.shape
    r = b32.shape[2]
    pt = P if interpret else _chunk_tile(P, c, k, r)
    mat = pl.BlockSpec(
        (pt, c, k, k), lambda i: (i, i * 0, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    vec = pl.BlockSpec(
        (pt, c, r, k), lambda i: (i, i * 0, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _solve_kernel,
        grid=(P // pt,),
        out_shape=jax.ShapeDtypeStruct(b32.shape, jnp.float32),
        in_specs=[mat, mat, vec],
        out_specs=vec,
        input_output_aliases={2: 0},  # x overwrites b in place
        interpret=interpret,
    )(chols, Lp32, b32)


def batched_thomas_factor_pallas(D: Array, L: Array, *, interpret=None):
    """float32 batched Thomas factorization.

    D: (P, c, k, k); L: (P, c-1, k, k).  Returns (chols, Lp32) for
    ``batched_thomas_solve_pallas`` (factor-once/solve-many).
    """
    if interpret is None:
        interpret = _default_interpret()
    Lp32 = _pad_sub(L.astype(jnp.float32))
    chols = _factor_call(D.astype(jnp.float32), Lp32, interpret)
    return chols, Lp32


def batched_thomas_solve_pallas(chols, Lp32, B, *, interpret=None):
    """Solve against a stored factorization.  B: (P, c, k) or
    (P, c, k, r); returns the same shape in float32.  Internally the
    rhs runs in transposed (P, c, r, k) layout for tiling."""
    if interpret is None:
        interpret = _default_interpret()
    squeeze = B.ndim == 3
    B32 = B.astype(jnp.float32)
    if squeeze:
        B32 = B32[..., None]
    Bt = jnp.swapaxes(B32, 2, 3)  # (P, c, r, k)
    # Mosaic (as of the 2026-08 toolchain) miscompiles the lane
    # reduction (P, 1, k) -> (P, 1) in the substitution sweeps
    # (vector.multi_reduction internal error); r >= 8 (a full sublane
    # tile) compiles and runs correctly, so pad thin rhs batches up
    r = Bt.shape[2]
    if not interpret and r < 8:
        pad = jnp.zeros(Bt.shape[:2] + (8 - r, Bt.shape[3]), jnp.float32)
        Bt = jnp.concatenate([Bt, pad], axis=2)
    xt = _solve_call(chols, Lp32, Bt, interpret)[:, :, :r]
    x = jnp.swapaxes(xt, 2, 3)
    return x[..., 0] if squeeze else x


def chol_pallas_supported(P: int, c: int, k: int, r: int = 1) -> bool:
    """VMEM feasibility: D/Lp/chol (+ one rhs set) resident at once,
    lane-padded to 128."""
    if k > MAX_CHOL_BLOCK:
        return False
    lane = max(k, 128)
    blk = max(k, 8) * lane * 4
    rhs = max(k, 8) * max(r, 128) * 4
    total = P * c * (3 * blk + 2 * rhs)
    return total <= 13 * 1024 * 1024
