"""Banded general-inequality NLPs through a structured SQP loop.

TPU-native medium-scale path (SURVEY.md §5.7, BASELINE config 3).  The
reference reaches n ~ 10^4-10^5 on *general* NLPs through sparse data
structures everywhere (sparse aug-Jacobian assembly + factorization,
src/main/aug_jac/standard_aug_jac.c:34-101 over src/main/fact/fact.c:22,
and sparse LP bases, src/main/lp/lpi_highs.c).  The TPU-native
equivalent replaces "sparse" with *block-banded*: variables are grouped
into N_b blocks of size k, and each constraint block couples two
adjacent variable blocks:

    min  sum_t f_t(x_t)
    s.t. clb_t <= c_t(x_t, x_{t+1}) <= cub_t      t = 0..N_b-2
         lb <= x <= ub

Any banded NLP (Jacobian bandwidth <= k) fits this form.  All data
stays O(N_b (k^2 + q k)) — never the dense (m, n) Jacobian:

* Jacobian: two (q, k) blocks per row block via vmapped `jacfwd`.
* Lagrangian Hessian: block-tridiagonal (k, k) blocks via vmapped
  `jax.hessian` of the per-stage Lagrangian.
* Working set: epsilon-active + wrong-sign dual dropping per iteration
  (the active-set estimate the reference reads off the LP basis,
  standard_cauchy.c:843), optionally *seeded* by a matrix-free PDLP
  solve of the exact reference Cauchy LP (`banded_cauchy`), whose
  operator form never materializes [J, I, -I, -I].
* EQP step: the active-set KKT system is condensed to the SPD
  block-tridiagonal K = H + rho I + (1/delta) J_W^T J_W (J block-
  bidiagonal => J^T J block-tridiagonal), solved by the existing
  Cholesky block-Thomas kernel (ops/block_tridiag.py) — the same kernel
  the OCP path shards over a mesh.  delta is the exact augmented-
  Lagrangian regularization; multipliers are recovered as
  lambda = (J_W d - t_W) / delta.  TPU note: this deliberately avoids
  LU (XLA TPU implements LuDecomposition only for f32) and keeps every
  stage-parallel operation a dense MXU matmul.
* Globalization: l1 exact-penalty merit + backtracking Armijo
  linesearch + Levenberg regularization driven by the reference
  reduction-ratio thresholds 0.9/0.3 (trust_radius.c:47-84), penalty
  kept above the multiplier scale (penalty.c:5-50).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .ops.block_tridiag import block_tridiag_solve
from .settings import Settings
from .types import (
    INF_THRESHOLD,
    HessEval,
    SolverPhase,
    Status,
    f32_compute_scope,
)

Array = jax.Array

REG_MIN = 1e-10
REG_MAX = 1e10
REG_FAIL = 1e-4
MAX_LINESEARCH_STEPS = 30
DELTA = 1e-8  # augmented-Lagrangian condensation regularization (f64 path)
# Mixed-precision condensation regularization: 1/delta sets the K
# conditioning the float32 factorization must survive; the delta-form
# constraint error O(delta * ||dlam||) vanishes as SQP converges.
DELTA_MIXED = 1e-4
# Consecutive infeasible rejections before the optimality loop hands
# over to the restoration phase (solver/phase.c analogue).
RESTORATION_TRIGGER = 4


class BandedProblem:
    """Block-banded NLP front end.

    obj_block(x_t, t) -> scalar (summed over t = 0..N_b-1)
    cons_block(x_t, x_next, t) -> (q,) for t = 0..N_b-2
    """

    def __init__(
        self,
        obj_block: Callable,
        num_blocks: int,
        block_size: int,
        cons_block: Optional[Callable] = None,
        cons_per_block: int = 0,
        var_lb=-jnp.inf,
        var_ub=jnp.inf,
        cons_lb=None,
        cons_ub=None,
        dtype=jnp.float64,
    ):
        self.obj_block = obj_block
        self.cons_block = cons_block
        self.N_b = int(num_blocks)
        self.k = int(block_size)
        self.q = int(cons_per_block)
        if self.N_b < 2:
            raise ValueError("BandedProblem needs at least 2 blocks")
        self.dtype = jnp.dtype(dtype)
        self.n = self.N_b * self.k
        self.m = (self.N_b - 1) * self.q

        def _expand(v, shape, default):
            if v is None:
                v = default
            arr = jnp.broadcast_to(
                jnp.asarray(v, dtype=self.dtype), shape
            )
            return arr

        self.var_lb = _expand(var_lb, (self.N_b, self.k), -jnp.inf)
        self.var_ub = _expand(var_ub, (self.N_b, self.k), jnp.inf)
        if self.q:
            self.cons_lb = _expand(cons_lb, (self.N_b - 1, self.q), -jnp.inf)
            self.cons_ub = _expand(cons_ub, (self.N_b - 1, self.q), jnp.inf)
        else:
            self.cons_lb = jnp.zeros((0, 0), self.dtype)
            self.cons_ub = jnp.zeros((0, 0), self.dtype)
        self.ts = jnp.arange(self.N_b)

    # -- vmapped evaluations (everything O(N_b * block work)) ----------

    def obj(self, X: Array) -> Array:
        return jnp.sum(jax.vmap(self.obj_block)(X, self.ts))

    def obj_grad(self, X: Array) -> Array:
        return jax.vmap(jax.grad(self.obj_block))(X, self.ts)

    def cons(self, X: Array) -> Array:
        """(N_b-1, q) constraint values."""
        return jax.vmap(self.cons_block)(X[:-1], X[1:], self.ts[:-1])

    def cons_jac_blocks(self, X: Array, compute_dtype=None):
        """Jl, Jr: (N_b-1, q, k) left/right Jacobian blocks.

        ``compute_dtype=float32`` runs the jacfwd passes inside a
        trace-time ``jax.enable_x64(False)`` scope (hardware-native f32
        on TPU, which emulates float64) and promotes the blocks back to
        the problem dtype; the values then carry float32 accuracy — a
        backward perturbation of the EQP, while feasibility and the
        stationarity residual stay exact (``cons_jtvp``)."""

        def _do(Xa, Xb):
            Jl = jax.vmap(jax.jacfwd(self.cons_block, argnums=0))(
                Xa, Xb, self.ts[:-1]
            )
            Jr = jax.vmap(jax.jacfwd(self.cons_block, argnums=1))(
                Xa, Xb, self.ts[:-1]
            )
            return Jl, Jr

        if self._mixed(compute_dtype):
            with f32_compute_scope():
                Jl, Jr = _do(
                    X[:-1].astype(jnp.float32), X[1:].astype(jnp.float32)
                )
            return Jl.astype(self.dtype), Jr.astype(self.dtype)
        return _do(X[:-1], X[1:])

    def _mixed(self, compute_dtype) -> bool:
        return (
            compute_dtype is not None
            and jnp.dtype(compute_dtype) == jnp.float32
            and jnp.dtype(self.dtype) == jnp.float64
        )

    def cons_jtvp(self, X: Array, lam: Array) -> Array:
        """J^T lam accumulated per variable block, (N_b, k), via one
        reverse pass per constraint block — exact in the problem dtype
        (the stationarity residual must stay float64-accurate when the
        materialized Jacobian blocks are assembled in float32)."""
        if not self.q:
            return jnp.zeros((self.N_b, self.k), self.dtype)

        def pull(a, b, lam_t, t):
            _, vjp_fn = jax.vjp(
                lambda aa, bb: self.cons_block(aa, bb, t), a, b
            )
            return vjp_fn(lam_t)  # (dL/da, dL/db)

        da, db = jax.vmap(pull)(X[:-1], X[1:], lam, self.ts[:-1])
        r = jnp.zeros((self.N_b, self.k), self.dtype)
        r = r.at[:-1].add(da)
        r = r.at[1:].add(db)
        return r

    def lag_hess_blocks(self, X: Array, lam: Array, compute_dtype=None):
        """Block-tridiagonal Lagrangian Hessian.

        Returns (Hd, Hs): Hd (N_b, k, k) diagonals, Hs (N_b-1, k, k)
        sub-diagonals (rows t+1, cols t).  ``compute_dtype=float32``:
        same float32 assembly scope as ``cons_jac_blocks``."""
        mixed = self._mixed(compute_dtype)

        def _do(Xc, lamc):
            Hd = jax.vmap(jax.hessian(self.obj_block))(Xc, self.ts)
            if not self.q:
                return Hd, jnp.zeros(
                    (self.N_b - 1, self.k, self.k), Hd.dtype
                )

            def pair_lag(a, b, lam_t, t):
                return jnp.vdot(lam_t, self.cons_block(a, b, t))

            def pair_hess(a, b, lam_t, t):
                z = jnp.concatenate([a, b])
                k = self.k

                def f(z):
                    return pair_lag(z[:k], z[k:], lam_t, t)

                return jax.hessian(f)(z)

            M = jax.vmap(pair_hess)(Xc[:-1], Xc[1:], lamc, self.ts[:-1])
            k = self.k
            A = M[:, :k, :k]  # d2/da2
            B = M[:, :k, k:]  # d2/da db
            C = M[:, k:, k:]  # d2/db2
            Hd = Hd.at[:-1].add(A)
            Hd = Hd.at[1:].add(C)
            Hs = jnp.transpose(B, (0, 2, 1))  # rows x_{t+1}, cols x_t
            return Hd, Hs

        if mixed:
            with f32_compute_scope():
                Hd, Hs = _do(
                    X.astype(jnp.float32), lam.astype(jnp.float32)
                )
            return Hd.astype(self.dtype), Hs.astype(self.dtype)
        return _do(X, lam)

    def clip(self, X: Array) -> Array:
        return jnp.clip(X, self.var_lb, self.var_ub)


# ---------------------------------------------------------------------------
# Matrix-free Cauchy LP (reference standard_cauchy.c LP, PDLP backend)
# ---------------------------------------------------------------------------


class BandedCauchyOp:
    """Operator view of the Cauchy LP matrix A = [J, I, -I, -I] for a
    block-bidiagonal J, satisfying the ops/pdlp.py DenseOp protocol.
    Columns: d (n), s+ (m), s- (m), w (m); rows: J d + s+ - s- - w = 0
    (cauchy.py layout, standard_cauchy.c:203-244) — never materialized."""

    def __init__(self, Jl: Array, Jr: Array):
        self.Jl, self.Jr = Jl, Jr
        self.Nc, self.q, self.k = Jl.shape
        self.N_b = self.Nc + 1
        n, m = self.N_b * self.k, self.Nc * self.q
        self.n, self.m_rows = n, m
        self.shape = (m, n + 3 * m)
        self.dtype = Jl.dtype

    def _split(self, x):
        n, m = self.n, self.m_rows
        return x[:n], x[n : n + m], x[n + m : n + 2 * m], x[n + 2 * m :]

    def _jmv(self, d):
        D = d.reshape(self.N_b, self.k)
        out = jnp.einsum("tqk,tk->tq", self.Jl, D[:-1])
        out = out + jnp.einsum("tqk,tk->tq", self.Jr, D[1:])
        return out.reshape(-1)

    def _jtmv(self, y):
        Y = y.reshape(self.Nc, self.q)
        out = jnp.zeros((self.N_b, self.k), self.dtype)
        out = out.at[:-1].add(jnp.einsum("tqk,tq->tk", self.Jl, Y))
        out = out.at[1:].add(jnp.einsum("tqk,tq->tk", self.Jr, Y))
        return out.reshape(-1)

    def mv(self, x):
        d, sp, sm, w = self._split(x)
        return self._jmv(d) + sp - sm - w

    def rmv(self, y):
        return jnp.concatenate([self._jtmv(y), y, -y, -y])

    def scaled_row_max(self, d_c):
        d, sp, sm, w = self._split(d_c)
        D = d.reshape(self.N_b, self.k)
        jmax = jnp.maximum(
            jnp.max(jnp.abs(self.Jl) * D[:-1, None, :], axis=2),
            jnp.max(jnp.abs(self.Jr) * D[1:, None, :], axis=2),
        ).reshape(-1)
        return jnp.maximum(jmax, jnp.maximum(sp, jnp.maximum(sm, w)))

    def scaled_col_max(self, d_r):
        Y = d_r.reshape(self.Nc, self.q)
        col = jnp.zeros((self.N_b, self.k), self.dtype)
        col = col.at[:-1].max(
            jnp.max(jnp.abs(self.Jl) * Y[:, :, None], axis=1)
        )
        col = col.at[1:].max(
            jnp.max(jnp.abs(self.Jr) * Y[:, :, None], axis=1)
        )
        return jnp.concatenate([col.reshape(-1), d_r, d_r, d_r])


def banded_cauchy(
    problem: BandedProblem,
    X: Array,
    trust_radius: Array,
    penalty: Array,
    tol: float = 1e-7,
    max_iterations: int = 20000,
):
    """Reference Cauchy LP on the banded problem via matrix-free PDLP.

    Returns (d, var_states, cons_states, pdlp_result): the l-inf
    trust-region LP step and the working-set estimate extracted from
    bound proximity + reduced-cost signs (the information the reference
    reads off the LP basis, standard_cauchy.c:843-1005).
    """
    from .ops import pdlp
    from .types import ActiveState

    Jl, Jr = problem.cons_jac_blocks(X)
    C = problem.cons(X).reshape(-1)
    g = problem.obj_grad(X).reshape(-1)
    op = BandedCauchyOp(Jl, Jr)
    n, m = op.n, op.m_rows
    dtype = problem.dtype

    big = jnp.asarray(1e20, dtype)
    x_flat = X.reshape(-1)
    vlb = problem.var_lb.reshape(-1)
    vub = problem.var_ub.reshape(-1)
    d_lb = jnp.maximum(
        jnp.where(vlb < -INF_THRESHOLD, -big, vlb - x_flat), -trust_radius
    )
    d_ub = jnp.minimum(
        jnp.where(vub > INF_THRESHOLD, big, vub - x_flat), trust_radius
    )
    clb = problem.cons_lb.reshape(-1)
    cub = problem.cons_ub.reshape(-1)
    w_lb = jnp.where(clb < -INF_THRESHOLD, -big, clb - C)
    w_ub = jnp.where(cub > INF_THRESHOLD, big, cub - C)
    zeros = jnp.zeros((m,), dtype)
    infs = jnp.full((m,), 1e20, dtype)
    lb = jnp.concatenate([d_lb, zeros, zeros, w_lb])
    ub = jnp.concatenate([d_ub, infs, infs, w_ub])
    c_obj = jnp.concatenate(
        [g, jnp.full((2 * m,), penalty, dtype), jnp.zeros((m,), dtype)]
    )

    res = pdlp.solve(
        op, c_obj, lb, ub, tol=tol, max_iterations=max_iterations
    )
    d = res.x[:n]

    # -- working-set extraction (cauchy.py semantics): a variable is
    # active only at a *true* bound (not the trust-region wall); a row is
    # active when its logical column sits at a bound.
    eps = 1e-6
    x_new = x_flat + d
    at_vlb = (vlb > -INF_THRESHOLD) & (
        x_new <= vlb + eps * (1.0 + jnp.abs(vlb))
    )
    at_vub = (vub < INF_THRESHOLD) & (
        x_new >= vub - eps * (1.0 + jnp.abs(vub))
    )
    rc = res.reduced_costs[:n]
    var_states = jnp.where(
        at_vlb & (rc >= 0.0),
        ActiveState.ACTIVE_LOWER,
        jnp.where(at_vub & (rc <= 0.0), ActiveState.ACTIVE_UPPER, 0),
    ).astype(jnp.int8)

    # a row is active only when its logical column sits at the bound AND
    # the (first-order, hence noisy) dual does not contradict the side —
    # dual magnitude alone misflags unresolved rows, bound proximity
    # alone cannot pick the side of a degenerate row
    w = res.x[n + 2 * m :]
    duals = res.duals
    prox = jnp.maximum(eps, 10.0 * res.primal_res)
    at_wlb = (clb > -INF_THRESHOLD) & (
        w <= w_lb + prox * (1.0 + jnp.abs(w_lb))
    )
    at_wub = (cub < INF_THRESHOLD) & (
        w >= w_ub - prox * (1.0 + jnp.abs(w_ub))
    )
    # LP row duals carry the opposite sign of the NLP multipliers (a
    # lower-active row has LP dual >= 0, NLP lambda <= 0)
    cons_states = jnp.where(
        at_wlb & (duals >= -eps),
        ActiveState.ACTIVE_LOWER,
        jnp.where(
            at_wub & (duals <= eps), ActiveState.ACTIVE_UPPER, 0
        ),
    ).astype(jnp.int8)
    # equalities are always active
    is_eq = jnp.abs(cub - clb) <= 1e-12 * (1.0 + jnp.abs(clb))
    cons_states = jnp.where(
        is_eq, ActiveState.ACTIVE_LOWER, cons_states
    ).astype(jnp.int8)
    return d, var_states, cons_states, res


# ---------------------------------------------------------------------------
# Structured SQP loop
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BandedState:
    X: Array  # (N_b, k)
    lam: Array  # (N_b-1, q) constraint duals
    act_low: Array  # (N_b-1, q) bool: active at lower
    act_up: Array  # (N_b-1, q) bool
    penalty: Array
    reg: Array
    iteration: Array
    status: Array
    num_accepted: Array
    num_rejected: Array
    obj_val: Array
    feas_res: Array
    stat_res: Array
    last_ratio: Array
    last_alpha: Array
    # ---- globalization parity with the dense path (trial_point.c runs
    # ONE algorithm at every scale; the structured path must not
    # silently degrade) ----------------------------------------------
    # top-level phase (solver/phase.c analogue): OPTIMIZATION or
    # RESTORATION (minimize constraint violation when the SQP loop
    # stalls infeasible)
    phase: Array  # int32 SolverPhase
    bad_steps: Array  # int32: consecutive infeasible rejections
    # block-diagonal quasi-Newton Hessian (settings.hess_eval != EXACT;
    # the banded analogue of the reference's SleqpHessStruct per-block
    # QN, quasi_newton.c) — shape (N_b, k, k), or (0,) when exact
    qn_B: Array
    qn_prev_X: Array  # (N_b, k) or (0,)
    qn_prev_g: Array  # (N_b, k) objective gradient at the previous point
    qn_prev_Jl: Array  # (N_b-1, q, k) or (0,)
    qn_prev_Jr: Array
    qn_pending: Array  # bool: a pair is ready to push


def banded_initial_state(
    problem: BandedProblem,
    settings: Settings,
    X0: Array,
    seed_working_set: bool = False,
) -> BandedState:
    dtype = problem.dtype
    X = problem.clip(jnp.asarray(X0, dtype))
    Nc, q = problem.N_b - 1, problem.q
    act_low = jnp.zeros((Nc, q), bool)
    act_up = jnp.zeros((Nc, q), bool)
    lam = jnp.zeros((Nc, q), dtype)
    if seed_working_set and q:
        # seed from the reference Cauchy LP (PDLP backend)
        _, _, cons_states, res = banded_cauchy(
            problem,
            X,
            jnp.asarray(1.0, dtype),
            jnp.asarray(10.0, dtype),
        )
        from .types import ActiveState

        cs = cons_states.reshape(Nc, q)
        act_low = cs == ActiveState.ACTIVE_LOWER
        act_up = cs == ActiveState.ACTIVE_UPPER
        # LP duals -> NLP multiplier sign convention
        lam = -res.duals.reshape(Nc, q).astype(dtype) * (cs != 0)
    zero = jnp.asarray(0.0, dtype)
    use_qn = settings.hess_eval != HessEval.EXACT
    empty = jnp.zeros((0,), dtype)
    return BandedState(
        X=X,
        lam=lam,
        act_low=act_low,
        act_up=act_up,
        penalty=jnp.asarray(10.0, dtype),
        reg=jnp.asarray(1e-8, dtype),
        iteration=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        num_accepted=jnp.asarray(0, jnp.int32),
        num_rejected=jnp.asarray(0, jnp.int32),
        obj_val=problem.obj(X),
        feas_res=zero + jnp.inf,
        stat_res=zero + jnp.inf,
        last_ratio=zero,
        last_alpha=zero,
        phase=jnp.asarray(SolverPhase.OPTIMIZATION, jnp.int32),
        bad_steps=jnp.asarray(0, jnp.int32),
        qn_B=(
            jnp.broadcast_to(
                jnp.eye(problem.k, dtype=dtype),
                (problem.N_b, problem.k, problem.k),
            )
            if use_qn
            else empty
        ),
        qn_prev_X=jnp.zeros((problem.N_b, problem.k), dtype)
        if use_qn
        else empty,
        qn_prev_g=jnp.zeros((problem.N_b, problem.k), dtype)
        if use_qn
        else empty,
        qn_prev_Jl=jnp.zeros((Nc, q, problem.k), dtype) if use_qn else empty,
        qn_prev_Jr=jnp.zeros((Nc, q, problem.k), dtype) if use_qn else empty,
        qn_pending=jnp.asarray(False),
    )


def _violation(problem, C):
    lo = jnp.maximum(problem.cons_lb - C, 0.0)
    lo = jnp.where(problem.cons_lb < -INF_THRESHOLD, 0.0, lo)
    hi = jnp.maximum(C - problem.cons_ub, 0.0)
    hi = jnp.where(problem.cons_ub > INF_THRESHOLD, 0.0, hi)
    return lo + hi


def _kkt_solve(
    problem, Hd, Hs, Jl, Jr, act, target, g_eff, frozen, reg, mixed=False
):
    """Condensed SPD block-tridiagonal EQP solve, in *delta form*.

    minimize 1/2 d^T (H + reg I) d + g_eff^T d
        s.t. J_W d = target (active rows), d_frozen = 0

    via the exact augmented Lagrangian K = H + reg I + (1/delta) J_W^T
    J_W (SPD, block-tridiagonal).  ``g_eff`` is the *stationarity
    residual* r = g + J^T lam_act at the current active-set multipliers
    (not the raw gradient), so the returned ``dlam = (J_W d - target) /
    delta`` is the multiplier INCREMENT — callers form lam_qp = lam_act
    + dlam.  The delta form is mathematically identical to the absolute
    form but its augmented-Lagrangian condensation error is
    O(delta * ||dlam||) instead of O(delta * ||lam||): the error vanishes
    as SQP converges, which is what lets the mixed configuration use a
    float32-friendly delta (same escalation as the OCP delta-form KKT,
    ocp.py::_structured_kkt_step).

    ``mixed=True``: delta = DELTA_MIXED (1e-4, conditioning ~1/delta
    fits float32), the block-Thomas factorization runs in hardware
    float32 (Pallas kernel when the block size fits, f32 scan
    otherwise), and the solution is refined against the float64 K with
    the fully parallel block matvec (ops/pallas_tridiag.py
    block_tridiag_solve_mp).  K itself is assembled in float64 so the
    Hessian is not rounded away under the 1/delta-scaled J^T J term.
    """
    N_b, k = problem.N_b, problem.k
    dtype = problem.dtype
    free = ~frozen  # (N_b, k)

    # masked Jacobian blocks: inactive rows and frozen columns drop out
    aw = act[:, :, None].astype(dtype)
    Jlm = Jl * aw * free[:-1, None, :]
    Jrm = Jr * aw * free[1:, None, :]

    # masked Hessian: zero frozen rows/cols, unit diagonal
    ff_outer = free[:, :, None] * free[:, None, :]
    Hdm = Hd * ff_outer + jnp.eye(k, dtype=dtype) * (
        1.0 - free[:, :, None] * free[:, None, :]
    ) * jnp.eye(k, dtype=dtype)
    Hdm = Hdm + jnp.eye(k, dtype=dtype) * reg
    Hsm = Hs * (free[1:, :, None] * free[:-1, None, :])

    delta = DELTA_MIXED if mixed else DELTA
    inv_delta = 1.0 / delta
    Kd = Hdm
    Kd = Kd.at[:-1].add(
        inv_delta * jnp.einsum("tqi,tqj->tij", Jlm, Jlm)
    )
    Kd = Kd.at[1:].add(
        inv_delta * jnp.einsum("tqi,tqj->tij", Jrm, Jrm)
    )
    Ks = Hsm + inv_delta * jnp.einsum("tqi,tqj->tij", Jrm, Jlm)

    tgt = target * act.astype(dtype)
    rhs = -(g_eff * free)
    rhs = rhs.at[:-1].add(inv_delta * jnp.einsum("tqk,tq->tk", Jlm, tgt))
    rhs = rhs.at[1:].add(inv_delta * jnp.einsum("tqk,tq->tk", Jrm, tgt))

    if mixed:
        from .ops.pallas_tridiag import block_tridiag_solve_mp

        # scan32 backend: f32 Cholesky block-Thomas scan + 3 f64-residual
        # refinement passes.  Measured fastest on-chip (15.4 ms at
        # n=10240 vs 21.3 ms for the f32 SPIKE — XLA's batched small
        # Cholesky/TriangularSolve are pathologically slow on TPU, so
        # SPIKE's parallel interiors lose to the plain scan; the
        # explicit-inverse Pallas kernel is numerically unusable under
        # this K's (1/delta)-scaled coupling).
        d = block_tridiag_solve_mp(
            Kd, Ks, rhs, refine_iters=3, backend="scan32"
        )
    else:
        d = block_tridiag_solve(Kd, Ks, rhs)
    d = d * free

    Jd = jnp.einsum("tqk,tk->tq", Jlm, d[:-1]) + jnp.einsum(
        "tqk,tk->tq", Jrm, d[1:]
    )
    dlam = (Jd - tgt) * inv_delta * act.astype(dtype)
    return d, dlam


def _block_bfgs_push(B: Array, s: Array, y: Array) -> Array:
    """Damped-BFGS update of the block-diagonal Hessian approximation,
    vmapped over blocks (the banded analogue of the reference's
    per-block quasi-Newton over SleqpHessStruct; Powell damping per
    quasi_newton.c / bfgs.c).

    B: (N_b, k, k) SPD approximations; s, y: (N_b, k) pair per block.
    Blocks with negligible step are skipped (their update is identity).
    """
    Bs = jnp.einsum("tij,tj->ti", B, s)
    sBs = jnp.einsum("ti,ti->t", s, Bs)
    sy = jnp.einsum("ti,ti->t", s, y)
    # Powell damping: keep s^T y_eff >= 0.2 s^T B s
    theta = jnp.where(
        sy >= 0.2 * sBs,
        1.0,
        0.8 * sBs / jnp.where(sBs - sy == 0.0, 1.0, sBs - sy),
    )
    y_eff = theta[:, None] * y + (1.0 - theta)[:, None] * Bs
    sy_eff = jnp.einsum("ti,ti->t", s, y_eff)
    tiny = jnp.finfo(B.dtype).eps
    ok = (sBs > tiny) & (sy_eff > tiny) & (jnp.einsum("ti,ti->t", s, s) > tiny)
    upd = (
        B
        - Bs[:, :, None] * Bs[:, None, :] / jnp.where(ok, sBs, 1.0)[:, None, None]
        + y_eff[:, :, None]
        * y_eff[:, None, :]
        / jnp.where(ok, sy_eff, 1.0)[:, None, None]
    )
    return jnp.where(ok[:, None, None], upd, B)


def _prev_jtvp(problem, Jl, Jr, lam):
    """J^T lam from MATERIALIZED blocks (the stored previous-iterate
    Jacobian of the QN pair push), (N_b, k)."""
    out = jnp.zeros((problem.N_b, problem.k), Jl.dtype)
    out = out.at[:-1].add(jnp.einsum("tqk,tq->tk", Jl, lam))
    out = out.at[1:].add(jnp.einsum("tqk,tq->tk", Jr, lam))
    return out


def _optimality_iteration(
    problem: BandedProblem, settings: Settings, state: BandedState
) -> BandedState:
    """One structured SQP iteration on the banded problem
    (problem_solver/iteration.c:350 with the subproblem layers
    specialized to block-banded structure)."""
    dtype = problem.dtype
    X = state.X
    N_b, k, q = problem.N_b, problem.k, problem.q

    # mixed configuration: float32 derivative-assembly, float64 solve +
    # residuals (TPUs emulate float64; same pattern as the OCP path —
    # the condensed solve itself stays float64 because the 1/DELTA
    # augmented-Lagrangian scaling is meaningless at float32 precision)
    cd = (
        jnp.float32
        if settings.compute_dtype == "float32"
        and jnp.dtype(dtype) == jnp.float64
        else None
    )
    g = problem.obj_grad(X)
    C = problem.cons(X)
    Jl, Jr = problem.cons_jac_blocks(X, compute_dtype=cd)
    viol = _violation(problem, C)
    feas_res = jnp.max(viol, initial=0.0)

    # ---- working-set update: epsilon-active + wrong-sign dual drop ----
    tol_act = settings.eps * 1e4
    scale_lo = 1.0 + jnp.abs(problem.cons_lb)
    scale_hi = 1.0 + jnp.abs(problem.cons_ub)
    is_eq = jnp.abs(problem.cons_ub - problem.cons_lb) <= 1e-12 * scale_lo
    near_lo = (problem.cons_lb > -INF_THRESHOLD) & (
        C <= problem.cons_lb + tol_act * scale_lo
    )
    near_up = (problem.cons_ub < INF_THRESHOLD) & (
        C >= problem.cons_ub - tol_act * scale_hi
    )
    # drop rows whose multiplier has the wrong sign (lower-active needs
    # lam <= 0, upper-active lam >= 0 — reference working-set semantics);
    # a just-released row must NOT be re-added by bound proximity, or the
    # EQP would pin it right back (classic active-set release)
    wrong_lo = state.act_low & ~is_eq & (state.lam > tol_act)
    wrong_up = state.act_up & (state.lam < -tol_act)
    keep_lo = state.act_low & ~wrong_lo
    keep_up = state.act_up & ~wrong_up
    act_low = is_eq | (near_lo & ~wrong_lo) | keep_lo
    act_up = (~is_eq) & ((near_up & ~wrong_up) | keep_up) & ~act_low
    act = act_low | act_up

    # EQP target: step onto the active bound (c + J d = bound)
    target = jnp.where(
        act_low, problem.cons_lb - C, jnp.where(act_up, problem.cons_ub - C, 0.0)
    )

    # ---- variable-bound freeze via reduced gradient -------------------
    # Multiplier base for the delta-form EQP: rows in the current
    # working set keep their duals, dropped rows are zeroed (reference
    # working-set semantics — an inactive constraint has zero
    # multiplier).  J^T lam via float64 vjp: exact regardless of the
    # assembly dtype.
    lam_act = state.lam * act.astype(dtype)
    r = g + problem.cons_jtvp(X, lam_act) if q else g
    at_lb = (problem.var_lb > -INF_THRESHOLD) & (
        X <= problem.var_lb + settings.eps * (1.0 + jnp.abs(problem.var_lb))
    )
    at_ub = (problem.var_ub < INF_THRESHOLD) & (
        X >= problem.var_ub - settings.eps * (1.0 + jnp.abs(problem.var_ub))
    )
    frozen = (at_lb & (r > 0.0)) | (at_ub & (r < 0.0))

    # ---- stationarity (free variables; frozen have bound duals) -------
    stat_res = jnp.max(jnp.abs(jnp.where(frozen, 0.0, r)), initial=0.0)
    # active-set sign optimality: no kept row with a wrong-signed dual
    sign_ok = jnp.all(
        jnp.where(
            state.act_low & ~is_eq,
            state.lam <= tol_act,
            jnp.where(state.act_up, state.lam >= -tol_act, True),
        )
    )
    optimal = (
        (feas_res <= settings.feas_tol)
        & (stat_res <= settings.stat_tol)
        & sign_ok
    )
    # a feasible stall with the regularization maxed out is a deadpoint
    # abort; an INFEASIBLE stall hands over to the restoration phase
    # instead (solver/phase.c analogue; see the phase transition below)
    infeasible_now = feas_res > settings.feas_tol
    deadpoint = (state.reg >= REG_MAX) & ~infeasible_now

    # ---- EQP step on the working set ----------------------------------
    use_qn = settings.hess_eval != HessEval.EXACT
    if use_qn:
        # push the pending pair at the NEW multipliers (quasi_newton.c:140
        # convention: y = gradL(x_new, lam_new) - gradL(x_old, lam_new),
        # the old Lagrangian gradient rebuilt from the stored blocks)
        def push(_):
            glag_old = state.qn_prev_g + _prev_jtvp(
                problem, state.qn_prev_Jl, state.qn_prev_Jr, lam_act
            )
            return _block_bfgs_push(
                state.qn_B, X - state.qn_prev_X, r - glag_old
            )

        qn_B = lax.cond(state.qn_pending, push, lambda _: state.qn_B, None)
        Hd = qn_B
        Hs = jnp.zeros((N_b - 1, k, k), dtype)
    else:
        qn_B = state.qn_B
        Hd, Hs = problem.lag_hess_blocks(X, lam_act, compute_dtype=cd)
    # delta form: gradient = the f64 stationarity residual r (small near
    # convergence), unknowns (d, dlam), lam_qp = lam_act + dlam — the
    # cancellation-free formulation that lets the float32-factored solve
    # converge to float64 tolerances (same pattern as the OCP path).
    d, dlam = _kkt_solve(
        problem,
        Hd,
        Hs,
        Jl,
        Jr,
        act,
        target,
        r,
        frozen,
        state.reg,
        mixed=cd is not None,
    )
    lam_qp = lam_act + dlam
    step_ok = jnp.all(jnp.isfinite(d)) & jnp.all(jnp.isfinite(lam_qp))
    d = jnp.where(step_ok, d, 0.0)
    lam_qp = jnp.where(step_ok, lam_qp, state.lam)

    # ---- penalty above multiplier scale (penalty.c:5-50) --------------
    lam_norm = jnp.max(jnp.abs(lam_qp), initial=0.0)
    penalty = jnp.where(
        state.penalty >= 1.5 * lam_norm,
        state.penalty,
        jnp.maximum(10.0 * state.penalty, 2.0 * lam_norm),
    )

    # ---- l1 merit + backtracking linesearch ---------------------------
    gd = jnp.sum(g * d)
    dHd = jnp.einsum("ti,tij,tj->", d, Hd, d) + 2.0 * jnp.einsum(
        "ti,tij,tj->", d[1:], Hs, d[:-1]
    )
    viol0 = jnp.sum(viol)
    merit0 = state.obj_val + penalty * viol0

    def trial_merit(alpha):
        Xa = problem.clip(X + alpha * d)
        Ca = problem.cons(Xa)
        viol_a = jnp.sum(_violation(problem, Ca))
        return problem.obj(Xa) + penalty * viol_a, Xa

    descent = penalty * viol0 - gd

    def ls_cond(carry):
        alpha, merit_a, kk, done = carry
        return (~done) & (kk < MAX_LINESEARCH_STEPS)

    def ls_body(carry):
        alpha, _, kk, _ = carry
        merit_a, _ = trial_merit(alpha)
        armijo = merit_a <= merit0 - settings.linesearch_eta * alpha * descent
        next_alpha = jnp.where(armijo, alpha, settings.linesearch_tau * alpha)
        return next_alpha, merit_a, kk + 1, armijo

    has_descent = (descent > 0.0) & step_ok
    alpha, _, _, ls_ok = lax.while_loop(
        ls_cond,
        ls_body,
        (
            jnp.asarray(1.0, dtype),
            merit0,
            jnp.asarray(0, jnp.int32),
            ~has_descent,
        ),
    )
    accepted = ls_ok & has_descent
    alpha = jnp.where(accepted, alpha, 0.0)

    merit_trial, X_new = trial_merit(alpha)
    pred = alpha * descent - 0.5 * alpha**2 * dHd
    actual = merit0 - merit_trial
    eps10 = 10.0 * jnp.finfo(dtype).eps * (1.0 + jnp.abs(merit0))
    tiny = (jnp.abs(pred) <= eps10) & (jnp.abs(actual) <= eps10)
    ratio = jnp.where(tiny, 1.0, actual / jnp.where(pred == 0.0, 1.0, pred))

    # ---- Levenberg update (trust_radius.c:47-84 thresholds) -----------
    reg_accept = jnp.where(
        ratio >= 0.9,
        jnp.maximum(state.reg / 7.0, REG_MIN),
        jnp.where(
            ratio >= 0.3, jnp.maximum(state.reg / 2.0, REG_MIN), state.reg
        ),
    )
    reg_reject = jnp.minimum(jnp.maximum(10.0 * state.reg, REG_FAIL), REG_MAX)
    reg_new = jnp.where(accepted, reg_accept, reg_reject)

    X_next = jnp.where(accepted, X_new, X)
    # delta form: the multiplier estimate moves with the iterate — a
    # rejected step keeps the old duals (in the absolute form lam was
    # re-derived from scratch each iteration, so a bad multiplier
    # self-corrected; an accumulated increment must not survive a
    # rejection)
    lam_next = jnp.where(accepted & step_ok, lam_qp, state.lam)

    # ---- restoration-phase trigger (solver/phase.c analogue) ----------
    # consecutive infeasible rejections, or a maxed-out regularization
    # while infeasible, mean the optimality loop cannot move: hand over
    # to the feasibility-restoration iteration with a fresh moderate
    # regularization.
    bad = (~accepted) & infeasible_now
    bad_steps = jnp.where(bad, state.bad_steps + 1, 0)
    enter_rest = infeasible_now & (
        (bad_steps >= RESTORATION_TRIGGER) | (state.reg >= REG_MAX)
    )
    phase_next = jnp.where(
        enter_rest, SolverPhase.RESTORATION, SolverPhase.OPTIMIZATION
    ).astype(jnp.int32)
    reg_next = jnp.where(enter_rest, jnp.asarray(1e-6, dtype), reg_new)
    bad_steps = jnp.where(enter_rest, 0, bad_steps)

    if use_qn:
        # record the pre-step point on acceptance; the pair pushes next
        # iteration once the new duals are available (quasi_newton.c)
        qn_prev_X = jnp.where(accepted, X, state.qn_prev_X)
        qn_prev_g = jnp.where(accepted, g, state.qn_prev_g)
        qn_prev_Jl = jnp.where(accepted, Jl, state.qn_prev_Jl)
        qn_prev_Jr = jnp.where(accepted, Jr, state.qn_prev_Jr)
        qn_pending = accepted
    else:
        qn_prev_X = state.qn_prev_X
        qn_prev_g = state.qn_prev_g
        qn_prev_Jl = state.qn_prev_Jl
        qn_prev_Jr = state.qn_prev_Jr
        qn_pending = state.qn_pending

    running = BandedState(
        X=X_next,
        lam=lam_next,
        act_low=act_low,
        act_up=act_up,
        penalty=penalty,
        reg=reg_next,
        iteration=state.iteration + 1,
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        num_accepted=state.num_accepted + accepted.astype(jnp.int32),
        num_rejected=state.num_rejected + (~accepted).astype(jnp.int32),
        obj_val=problem.obj(X_next),
        feas_res=feas_res,
        stat_res=stat_res,
        last_ratio=ratio,
        last_alpha=alpha,
        phase=phase_next,
        bad_steps=bad_steps,
        qn_B=qn_B,
        qn_prev_X=qn_prev_X,
        qn_prev_g=qn_prev_g,
        qn_prev_Jl=qn_prev_Jl,
        qn_prev_Jr=qn_prev_Jr,
        qn_pending=qn_pending,
    )

    stop = optimal | deadpoint
    stop_status = jnp.where(
        optimal, Status.OPTIMAL, Status.ABORT_DEADPOINT
    ).astype(jnp.int32)
    stopped = dataclasses.replace(
        state, status=stop_status, feas_res=feas_res, stat_res=stat_res
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(stop, a, b), stopped, running
    )


def _restoration_iteration(
    problem: BandedProblem, settings: Settings, state: BandedState
) -> BandedState:
    """Feasibility restoration on the banded path.

    The dense path switches to a dedicated restoration NLP when the
    optimality loop stalls infeasible (solver/phase.c:97-147,
    restoration.c); the structured analogue minimizes the constraint
    violation directly with Levenberg-regularized Gauss-Newton steps
    through the SAME condensed block-tridiagonal solve: with an identity
    prox metric and the violated rows as working set, the augmented-
    Lagrangian condensation yields the minimum-norm step onto the
    linearized violated constraints.  Returns to OPTIMIZATION once
    feasible (duals preserved, penalty escalated x10 like
    solver.py:336-377); a maxed-out regularization while still
    infeasible is a local-infeasibility certificate (Status.INFEASIBLE).
    """
    dtype = problem.dtype
    X = state.X
    N_b, k = problem.N_b, problem.k
    cd = (
        jnp.float32
        if settings.compute_dtype == "float32"
        and jnp.dtype(dtype) == jnp.float64
        else None
    )
    C = problem.cons(X)
    viol = _violation(problem, C)
    phi0 = jnp.sum(viol)
    feas_res = jnp.max(viol, initial=0.0)
    Jl, Jr = problem.cons_jac_blocks(X, compute_dtype=cd)

    below = (problem.cons_lb > -INF_THRESHOLD) & (C < problem.cons_lb)
    above = (problem.cons_ub < INF_THRESHOLD) & (C > problem.cons_ub)
    act = below | above
    target = jnp.where(
        below,
        problem.cons_lb - C,
        jnp.where(above, problem.cons_ub - C, 0.0),
    )

    frozen = jnp.zeros((N_b, k), bool)
    Hd = jnp.broadcast_to(jnp.eye(k, dtype=dtype), (N_b, k, k))
    Hs = jnp.zeros((N_b - 1, k, k), dtype)
    zeros_g = jnp.zeros((N_b, k), dtype)
    d, _ = _kkt_solve(
        problem,
        Hd,
        Hs,
        Jl,
        Jr,
        act,
        target,
        zeros_g,
        frozen,
        state.reg,
        mixed=cd is not None,
    )
    step_ok = jnp.all(jnp.isfinite(d))
    d = jnp.where(step_ok, d, 0.0)

    # predicted violation drop of the FULL linearized step
    Jd = jnp.einsum("tqk,tk->tq", Jl, d[:-1]) + jnp.einsum(
        "tqk,tk->tq", Jr, d[1:]
    )
    viol_lin = _violation(problem, C + Jd)
    descent = phi0 - jnp.sum(viol_lin)

    def trial(alpha):
        Xa = problem.clip(X + alpha * d)
        return jnp.sum(_violation(problem, problem.cons(Xa))), Xa

    def ls_cond(carry):
        alpha, _, kk, done = carry
        return (~done) & (kk < MAX_LINESEARCH_STEPS)

    def ls_body(carry):
        alpha, _, kk, _ = carry
        phi_a, _ = trial(alpha)
        armijo = phi_a <= phi0 - settings.linesearch_eta * alpha * descent
        next_alpha = jnp.where(armijo, alpha, settings.linesearch_tau * alpha)
        return next_alpha, phi_a, kk + 1, armijo

    has_descent = (descent > 0.0) & step_ok
    alpha, _, _, ls_ok = lax.while_loop(
        ls_cond,
        ls_body,
        (
            jnp.asarray(1.0, dtype),
            phi0,
            jnp.asarray(0, jnp.int32),
            ~has_descent,
        ),
    )
    accepted = ls_ok & has_descent
    alpha = jnp.where(accepted, alpha, 0.0)
    phi_new, X_new = trial(alpha)

    pred = alpha * descent
    eps10 = 10.0 * jnp.finfo(dtype).eps * (1.0 + jnp.abs(phi0))
    tiny = (jnp.abs(pred) <= eps10) & (jnp.abs(phi0 - phi_new) <= eps10)
    ratio = jnp.where(
        tiny, 1.0, (phi0 - phi_new) / jnp.where(pred == 0.0, 1.0, pred)
    )
    reg_accept = jnp.where(
        ratio >= 0.9,
        jnp.maximum(state.reg / 7.0, REG_MIN),
        jnp.where(
            ratio >= 0.3, jnp.maximum(state.reg / 2.0, REG_MIN), state.reg
        ),
    )
    reg_reject = jnp.minimum(jnp.maximum(10.0 * state.reg, REG_FAIL), REG_MAX)
    reg_new = jnp.where(accepted, reg_accept, reg_reject)

    X_next = jnp.where(accepted, X_new, X)
    feas_new = jnp.max(_violation(problem, problem.cons(X_next)), initial=0.0)
    restored = feas_new <= settings.feas_tol
    # local-infeasibility certificate: GN on the violation cannot move
    locally_infeasible = (~restored) & (state.reg >= REG_MAX)

    running = dataclasses.replace(
        state,
        X=X_next,
        penalty=jnp.where(restored, 10.0 * state.penalty, state.penalty),
        reg=jnp.where(restored, jnp.asarray(1e-8, dtype), reg_new),
        iteration=state.iteration + 1,
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        num_accepted=state.num_accepted + accepted.astype(jnp.int32),
        num_rejected=state.num_rejected + (~accepted).astype(jnp.int32),
        obj_val=problem.obj(X_next),
        feas_res=feas_new,
        last_ratio=ratio,
        last_alpha=alpha,
        phase=jnp.where(
            restored, SolverPhase.OPTIMIZATION, SolverPhase.RESTORATION
        ).astype(jnp.int32),
        bad_steps=jnp.asarray(0, jnp.int32),
        qn_pending=jnp.asarray(False),  # the pair straddles a phase jump
    )
    stopped = dataclasses.replace(
        state,
        status=jnp.asarray(Status.INFEASIBLE, jnp.int32),
        feas_res=feas_res,
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(locally_infeasible, a, b), stopped, running
    )


def banded_perform_iteration(
    problem: BandedProblem, settings: Settings, state: BandedState
) -> BandedState:
    """One banded iteration: dispatch on the top-level phase
    (solver/phase.c) — the optimality SQP loop or the feasibility
    restoration loop."""
    return lax.cond(
        state.phase == SolverPhase.RESTORATION,
        lambda s: _restoration_iteration(problem, settings, s),
        lambda s: _optimality_iteration(problem, settings, s),
        state,
    )


@partial(jax.jit, static_argnums=(0, 1, 3))
def banded_solve_jit(
    problem: BandedProblem,
    settings: Settings,
    state0: BandedState,
    max_iterations: int,
) -> BandedState:
    def cond(s):
        return (s.status == Status.RUNNING) & (s.iteration < max_iterations)

    def body(s):
        return banded_perform_iteration(problem, settings, s)

    final = lax.while_loop(cond, body, state0)
    return dataclasses.replace(
        final,
        status=jnp.where(
            final.status == Status.RUNNING,
            jnp.asarray(Status.ABORT_ITER, jnp.int32),
            final.status,
        ),
    )


def banded_solve(
    problem: BandedProblem,
    settings: Optional[Settings] = None,
    X0: Optional[Array] = None,
    max_iterations: int = 200,
    seed_working_set: bool = False,
) -> BandedState:
    """Solve a banded NLP; returns the final BandedState."""
    settings = settings or Settings()
    if X0 is None:
        X0 = jnp.zeros((problem.N_b, problem.k), problem.dtype)
    state0 = banded_initial_state(
        problem, settings, X0, seed_working_set=seed_working_set
    )
    return banded_solve_jit(problem, settings, state0, max_iterations)
