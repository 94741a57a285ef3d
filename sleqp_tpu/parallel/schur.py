"""Multi-device Schur-complement block-tridiagonal KKT solve.

The BASELINE north star for distribution: block-structured (OCP/
multistage) KKT systems partitioned over a device mesh with collective
Schur-complement assembly (SURVEY.md §5.7-5.8, BASELINE configs 4-5) —
the TPU-native replacement for the reference's single-process MUMPS/MPI
path (mpi_utils.c only ever calls MPI_Init).

Each device owns one contiguous chunk of blocks: it factors its interior
block-tridiagonal independently, computes its (k x k) contributions to
the separator Schur system, `all_gather`s them over ICI, solves the small
replicated separator system, and back-substitutes locally.  One
communication round of O(P k^2) bytes replaces any sequential coupling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.block_tridiag import (
    block_thomas_factor,
    block_thomas_solve,
    block_tridiag_solve,
)
from ..ops.pallas_tridiag import block_tridiag_solve_mp

Array = jax.Array


def chunk_layout(D: Array, L: Array, b: Array, num_chunks: int):
    """Split a global block-tridiagonal system into the chunked layout.

    Requires N = num_chunks * c - 1.  Returns per-chunk arrays with dummy
    (zero) couplings padded at the global boundaries:

      D_ch (P, c-1, k, k), L_ch (P, c-2, k, k), b_ch (P, c-1, k),
      E_pad (P, k, k)  separator p  <- last block of chunk p  (E[P-1]=0)
      F_pad (P, k, k)  first block of chunk p <- separator p-1 (F[0]=0)
      D_sep (P, k, k)  separator diagonals (last entry dummy identity)
      b_sep (P, k)
    """
    N, k, _ = D.shape
    Pc = num_chunks
    if (N + 1) % Pc != 0:
        raise ValueError(f"N+1={N + 1} not divisible by num_chunks={Pc}")
    c = (N + 1) // Pc
    nin = c - 1
    sep_idx = jnp.arange(1, Pc) * c - 1
    chunk_start = jnp.arange(Pc) * c

    def gather_chunk(start):
        ids = start + jnp.arange(nin)
        return D[ids], L[ids[:-1]], b[ids]

    D_ch, L_ch, b_ch = jax.vmap(gather_chunk)(chunk_start)

    zero = jnp.zeros((1, k, k), D.dtype)
    E_pad = jnp.concatenate([L[sep_idx - 1], zero], axis=0)
    F_pad = jnp.concatenate([zero, L[sep_idx]], axis=0)
    D_sep = jnp.concatenate([D[sep_idx], jnp.eye(k, dtype=D.dtype)[None]], 0)
    b_sep = jnp.concatenate([b[sep_idx], jnp.zeros((1, k), D.dtype)], 0)
    return D_ch, L_ch, b_ch, E_pad, F_pad, D_sep, b_sep, sep_idx, chunk_start


def _local_contributions(D_c, L_c, b_c, E_p, F_p):
    """Per-chunk interior elimination (runs independently per device)."""
    nin, k = b_c.shape
    chols = block_thomas_factor(D_c, L_c)
    u = block_thomas_solve(chols, L_c, b_c)

    rhs_left = jnp.zeros((nin, k, k), D_c.dtype).at[0].set(F_p)
    rhs_right = jnp.zeros((nin, k, k), D_c.dtype).at[-1].set(E_p.T)
    VL = block_thomas_solve(chols, L_c, rhs_left)
    VR = block_thomas_solve(chols, L_c, rhs_right)

    # Schur contributions (see ops/block_tridiag.schur_block_tridiag_solve)
    right_diag = E_p @ VR[-1]  # -> separator p diagonal
    left_diag = F_p.T @ VL[0]  # -> separator p-1 diagonal
    off = E_p @ VL[-1]  # -> coupling (sep p-1, sep p)
    rhs_right_sep = E_p @ u[-1]  # -> separator p rhs
    rhs_left_sep = F_p.T @ u[0]  # -> separator p-1 rhs
    return u, VL, VR, (right_diag, left_diag, off, rhs_right_sep, rhs_left_sep)


def _local_contributions_pallas(D_c, L_c, b_c, E_p, F_p):
    """Interior elimination through the fused Pallas kernel: the raw rhs
    and both coupling column sets solve against ONE factorization pass
    (a single stacked (1+2k)-column rhs)."""
    nin, k = b_c.shape
    rhs_left = jnp.zeros((nin, k, k), D_c.dtype).at[0].set(F_p)
    rhs_right = jnp.zeros((nin, k, k), D_c.dtype).at[-1].set(E_p.T)
    B = jnp.concatenate([b_c[:, :, None], rhs_left, rhs_right], axis=-1)
    X = block_tridiag_solve_mp(D_c, L_c, B, refine_iters=3)
    u, VL, VR = X[..., 0], X[..., 1 : 1 + k], X[..., 1 + k :]

    right_diag = E_p @ VR[-1]
    left_diag = F_p.T @ VL[0]
    off = E_p @ VL[-1]
    rhs_right_sep = E_p @ u[-1]
    rhs_left_sep = F_p.T @ u[0]
    return u, VL, VR, (right_diag, left_diag, off, rhs_right_sep, rhs_left_sep)


def sharded_schur_solve(
    D: Array,
    L: Array,
    b: Array,
    mesh: Mesh,
    axis_name: str = "chunks",
    tridiag_backend: str = "scan",
):
    """Solve the SPD block-tridiagonal system across a device mesh.

    The chunk dimension is sharded over ``axis_name``; separator data is
    gathered with `all_gather` and the small separator system is solved
    replicated on every device.  ``tridiag_backend="pallas"`` runs each
    device's interior elimination through the fused VMEM-resident kernel
    (ops/pallas_tridiag.py).
    """
    Pc = mesh.shape[axis_name]
    (
        D_ch,
        L_ch,
        b_ch,
        E_pad,
        F_pad,
        D_sep,
        b_sep,
        sep_idx,
        chunk_start,
    ) = chunk_layout(D, L, b, Pc)
    N, k, _ = D.shape
    nin = b_ch.shape[1]

    spec_ch = P(axis_name)

    local = (
        _local_contributions_pallas
        if tridiag_backend == "pallas"
        else _local_contributions
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_ch,) * 7,
        out_specs=(spec_ch, P()),
        check_vma=False,
    )
    def run(D_c, L_c, b_c, E_p, F_p, D_s, b_s):
        # leading dim is the local shard (size 1 per device here)
        u, VL, VR, contribs = jax.vmap(local)(D_c, L_c, b_c, E_p, F_p)
        right_diag, left_diag, off, rhs_r, rhs_l = contribs

        # gather all per-chunk contributions + separator data
        gather = lambda x: jax.lax.all_gather(
            x, axis_name, axis=0, tiled=True
        )
        g_right = gather(right_diag)
        g_left = gather(left_diag)
        g_off = gather(off)
        g_rhs_r = gather(rhs_r)
        g_rhs_l = gather(rhs_l)
        g_D_sep = gather(D_s)
        g_b_sep = gather(b_s)

        # assemble the (P-1)-block separator system (replicated)
        S_diag = g_D_sep[: Pc - 1] - g_right[: Pc - 1] - g_left[1:Pc]
        S_sub = -g_off[1 : Pc - 1]
        S_rhs = g_b_sep[: Pc - 1] - g_rhs_r[: Pc - 1] - g_rhs_l[1:Pc]
        s = block_tridiag_solve(S_diag, S_sub, S_rhs)  # (P-1, k)

        # local back-substitution with neighboring separator values
        p = jax.lax.axis_index(axis_name)
        zero = jnp.zeros((k,), D_c.dtype)
        s_left = jnp.where(p > 0, s[jnp.maximum(p - 1, 0)], zero)
        s_right = jnp.where(p < Pc - 1, s[jnp.minimum(p, Pc - 2)], zero)
        x_local = (
            u[0]
            - jnp.einsum("nab,b->na", VL[0], s_left)
            - jnp.einsum("nab,b->na", VR[0], s_right)
        )
        return x_local[None], s

    x_ch, s = run(D_ch, L_ch, b_ch, E_pad, F_pad, D_sep, b_sep)

    # reassemble the global ordering
    x = jnp.zeros((N, k), dtype=D.dtype)
    ids = (chunk_start[:, None] + jnp.arange(nin)[None, :]).reshape(-1)
    x = x.at[ids].set(x_ch.reshape(-1, k))
    x = x.at[sep_idx].set(s)
    return x
