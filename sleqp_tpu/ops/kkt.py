"""Augmented-Jacobian (KKT) solves over a masked working set.

TPU-native equivalent of the reference aug_jac layer
(src/main/aug_jac/standard_aug_jac.c, reduced_aug_jac.c): systems with the
augmented matrix ``[I A_W^T; A_W 0]`` where ``A_W`` selects working-set rows
of ``A = [I_n; J]`` (variable bounds first, then constraints).

Design: instead of assembling a variable-size sparse system per working set
(impossible under jit), we solve the *fixed-shape* masked normal equations.
With ``B = A^T D`` (n x (n+m), D = diag(active mask)) and
``C = I - D``:

    S = C + B^T B          ((n+m) x (n+m), symmetric positive definite
                            whenever A_W has independent rows; inactive
                            rows contribute identity)

One Cholesky factorization of S per working-set change serves all three
query types (mirroring the reference vtable, aug_jac/aug_jac_types.h:27-35):

  * solve_min_norm(rhs): min ||x|| s.t. A_W x = rhs_W
  * solve_lsq(g):        lambda minimizing ||A_W^T lambda - g||
  * project_nullspace(v): projection of v onto null(A_W)

This is the analogue of the reference's REDUCED method
(reduced_aug_jac.c:19-21: form J^T J and factor the smaller system); the
dense Cholesky maps straight onto the MXU.  A blocked/sparse Pallas
factorization replaces `cho_factor` for large structured problems.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from ..types import ActiveState

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AugJac:
    """Factorized masked KKT system (one per working-set change).

    ``chol`` is a lower-triangular factor with chol @ chol.T = S.  Two
    ways to compute it mirror the reference factorization variants
    (pub_types.h:190-196 SLEQP_AUG_JAC_METHOD):

    * REDUCED (default): Cholesky of S directly (reduced_aug_jac.c forms
      the Gram matrix and factors the smaller system).
    * DIRECT: QR of the stacked matrix M = [B; I - D] — since
      M^T M = B^T B + (I - D) = S, the triangular R satisfies
      R^T R = S with cond(R) = sqrt(cond(S)): the numerically robust
      route of direct_aug_jac.c/fact_qr.c, at ~2x the factorization cost.

    Both produce the same lower factor interface, so every solve below is
    method-agnostic.
    """

    chol: Array  # ((n+m), (n+m)) lower factor of S
    B: Array  # (n, n+m) = A^T D
    active: Array  # (n+m,) float mask of working set


def aug_jac_create(
    cons_jac: Array,
    var_states: Array,
    cons_states: Array,
    reg: float = 0.0,
    method: str = "reduced",
) -> AugJac:
    """Assemble and factorize (reference: standard_aug_jac.c:34-101 + fact).

    ``reg`` adds a tiny multiple of the identity to S, guarding against a
    rank-deficient working set (the reference would fail factorization).
    """
    m, n = cons_jac.shape
    dtype = cons_jac.dtype
    active = (
        jnp.concatenate([var_states, cons_states]) != ActiveState.INACTIVE
    ).astype(dtype)
    # A = [I_n; J]; B = A^T D computed without materializing A.
    B = jnp.concatenate(
        [jnp.diag(active[:n]), cons_jac.T * active[n:][None, :]], axis=1
    )
    if method == "direct":
        M = jnp.concatenate([B, jnp.diag(1.0 - active)], axis=0)
        R = jnp.linalg.qr(M, mode="r")  # (n+m, n+m) upper, R^T R = S
        return AugJac(chol=R.T, B=B, active=active)
    S = jnp.diag(1.0 - active) + B.T @ B
    if reg:
        S = S + reg * jnp.eye(n + m, dtype=dtype)
    chol = cho_factor(S, lower=True)[0]
    return AugJac(chol=chol, B=B, active=active)


def solve_min_norm(aj: AugJac, rhs: Array) -> Array:
    """Min-norm x with A_W x = rhs on the working set; rhs is (n+m,).

    Inactive entries of rhs are ignored (masked).  Reference:
    aug_jac_solve_min_norm (used by working_step.c:452, soc.c).
    """
    lam = cho_solve((aj.chol, True), -(aj.active * rhs))
    return -(aj.B @ lam)


def solve_lsq(aj: AugJac, g: Array):
    """Least-squares duals: lambda = argmin ||A_W^T lambda - g||.

    Returns (x, lambda) where x = g - A_W^T lambda is the projection of g
    onto null(A_W).  Reference: aug_jac_solve_lsq
    (dual_estimation_lsq.c:19-30) and project_nullspace share this solve.
    """
    lam = cho_solve((aj.chol, True), aj.B.T @ g)
    x = g - aj.B @ lam
    return x, lam


def project_nullspace(aj: AugJac, v: Array) -> Array:
    """Project v onto null(A_W) (used per CG iteration, newton.c hot loop)."""
    return solve_lsq(aj, v)[0]
