"""Augmented-Jacobian (KKT) solves over a masked working set.

TPU-native equivalent of the reference aug_jac layer
(src/main/aug_jac/standard_aug_jac.c, reduced_aug_jac.c, direct_aug_jac.c):
systems with the augmented matrix ``[I A_W^T; A_W 0]`` where ``A_W``
selects working-set rows of ``A = [I_n; J]`` (variable bounds first, then
constraints).

Key structure (this is where the reference's sparse factorizations are
replaced by algebra): with Dv/Dc the active-variable/constraint masks, the
masked Gram matrix S = (I - D) + D A A^T D has an *identity* variable
block, so eliminating it leaves the m x m constraint Schur complement

    Sc = (I - Dc) + Dc J (I - Dv) J^T Dc

One m x m factorization per working-set change serves all three query
types (mirroring the reference vtable, aug_jac/aug_jac_types.h:27-35):

  * solve_min_norm(rhs): min ||x|| s.t. A_W x = rhs_W
  * solve_lsq(g):        lambda minimizing ||A_W^T lambda - g||
  * project_nullspace(v): projection of v onto null(A_W)

Every solve is O(n m) products + one m x m triangular solve — the whole
SQP iteration scales as O(n m + m^3) in the KKT component, the dense
analogue of the reference's sparse-factorization scaling.

Factorization methods (pub_types.h:190-196 SLEQP_AUG_JAC_METHOD):
  * "reduced" (default): Cholesky of Sc.
  * "direct": QR of M = [(I-Dv) J^T Dc; I-Dc] with M^T M = Sc —
    half the condition number, ~2x the factorization cost
    (direct_aug_jac.c / fact_qr.c).
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
    """Factorized masked KKT system (one per working-set change)."""

    chol: Array  # (m, m) lower factor of Sc
    cons_jac: Array  # (m, n) J
    active_var: Array  # (n,) Dv diagonal (float 0/1)
    active_cons: Array  # (m,) Dc diagonal


def aug_jac_create(
    cons_jac: Array,
    var_states: Array,
    cons_states: Array,
    reg: float = 0.0,
    method: str = "reduced",
) -> AugJac:
    """Assemble and factorize (reference: standard_aug_jac.c:34-101 + fact).

    ``reg`` adds a tiny multiple of the identity to Sc, guarding against a
    rank-deficient working set (the reference would fail factorization).
    """
    m, n = cons_jac.shape
    dtype = cons_jac.dtype
    dv = (var_states != ActiveState.INACTIVE).astype(dtype)
    dc = (cons_states != ActiveState.INACTIVE).astype(dtype)

    JF = cons_jac * (1.0 - dv)[None, :]  # J (I - Dv): free-variable columns
    if method == "direct":
        M = jnp.concatenate(
            [JF.T * dc[None, :], jnp.diag(1.0 - dc)], axis=0
        )  # ((n+m), m), M^T M = Sc
        R = jnp.linalg.qr(M, mode="r")
        chol = R.T
    else:
        Sc = jnp.diag(1.0 - dc) + dc[:, None] * (JF @ cons_jac.T) * dc[None, :]
        if reg:
            Sc = Sc + reg * jnp.eye(m, dtype=dtype)
        chol = cho_factor(Sc, lower=True)[0]
    return AugJac(chol=chol, cons_jac=cons_jac, active_var=dv, active_cons=dc)


def _solve_S(aj: AugJac, rv: Array, rc: Array):
    """Solve S lam = (rv, rc) via the constraint Schur complement.

    lam_c = Sc^{-1} (rc - Dc J Dv rv);  lam_v = rv - Dv J^T Dc lam_c.
    """
    dv, dc = aj.active_var, aj.active_cons
    rhs_c = rc - dc * (aj.cons_jac @ (dv * rv))
    lam_c = cho_solve((aj.chol, True), rhs_c)
    lam_v = rv - dv * (aj.cons_jac.T @ (dc * lam_c))
    return lam_v, lam_c


def _B_apply(aj: AugJac, lam_v: Array, lam_c: Array) -> Array:
    """x = B lam = A^T D lam = Dv lam_v + J^T (Dc lam_c)."""
    return aj.active_var * lam_v + aj.cons_jac.T @ (aj.active_cons * lam_c)


def solve_min_norm(aj: AugJac, rhs: Array) -> Array:
    """Min-norm x with A_W x = rhs on the working set; rhs is (n+m,).

    Inactive entries of rhs are ignored (masked).  Reference:
    aug_jac_solve_min_norm (used by working_step.c:452, soc.c).
    """
    n = aj.cons_jac.shape[1]
    rv = -(aj.active_var * rhs[:n])
    rc = -(aj.active_cons * rhs[n:])
    lam_v, lam_c = _solve_S(aj, rv, rc)
    return -_B_apply(aj, lam_v, lam_c)


def solve_lsq(aj: AugJac, g: Array):
    """Least-squares duals: lambda = argmin ||A_W^T lambda - g||.

    Returns (x, lambda) where x = g - A_W^T lambda is the projection of g
    onto null(A_W).  Reference: aug_jac_solve_lsq
    (dual_estimation_lsq.c:19-30) and project_nullspace share this solve.
    """
    # B^T g = D A g = (Dv g, Dc J g)
    rv = aj.active_var * g
    rc = aj.active_cons * (aj.cons_jac @ g)
    lam_v, lam_c = _solve_S(aj, rv, rc)
    x = g - _B_apply(aj, lam_v, lam_c)
    lam = jnp.concatenate([lam_v, lam_c])
    return x, lam


def project_nullspace(aj: AugJac, v: Array) -> Array:
    """Project v onto null(A_W) (used per CG iteration, newton.c hot loop)."""
    return solve_lsq(aj, v)[0]
