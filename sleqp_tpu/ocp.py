"""Block-structured (multistage / OCP) problems through the SQP loop.

TPU-native large-scale path (SURVEY.md §5.7, BASELINE configs 4-5).  The
reference handles large problems purely through *sparsity* (sparse LP bases
+ sparse KKT factorizations behind src/main/fact/); the TPU-native
equivalent exploits *block structure* instead: a discrete-time optimal
control problem

    min  sum_t l_t(x_t, u_t) + l_f(x_T)
    s.t. x_{t+1} = f_t(x_t, u_t),   x_0 fixed,   u_lb <= u_t <= u_ub

has a block-diagonal Lagrangian Hessian (one (nx+nu)^2 block per stage,
reference SleqpHessStruct semantics, pub_hess_struct.h:8-40) and a
block-bidiagonal constraint Jacobian, so the *dual* Schur complement
``S = J H^-1 J^T`` is block-tridiagonal SPD with (nx x nx) blocks — exactly
the structured kernel in ops/block_tridiag.py (sequential Thomas) and
parallel/schur.py (SPIKE over a device mesh).

The SQP iteration mirrors the reference problem-solver loop
(problem_solver/iteration.c:350) with the subproblem layers specialized to
the structure:

* Cauchy LP + working-set extraction -> not needed: the dynamics rows are
  equalities (always active); control bounds are handled by an active-set
  freeze using the reduced gradient at the current duals (the same
  information the reference extracts from the LP basis,
  standard_cauchy.c:843).
* aug-Jac factorization -> stage-wise Cholesky of the regularized Hessian
  blocks + the block-tridiagonal dual Schur solve.
* trust region -> adaptive Levenberg regularization ``rho`` on the Hessian
  blocks, updated with the reference reduction-ratio thresholds 0.9/0.3
  (trust_radius.c:47-84).
* globalization -> the same l1 exact-penalty merit (merit.c:60) with a
  backtracking Armijo linesearch and the penalty kept above the multiplier
  norm (the structured stand-in for the Byrd update, penalty.c:5-50).

Every per-stage operation vmaps across stages (batched dense MXU work);
the only sequential coupling is the block-tridiagonal solve, whose depth
drops from O(T) to O(T/P + P) on a P-device mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_factor, cho_solve

from .ops.block_tridiag import block_tridiag_solve
from .ops.pallas_tridiag import block_tridiag_solve_mp
from .settings import Settings
from .types import Status, f32_compute_scope

Array = jax.Array

# Levenberg regularization bounds (the structured analogue of the
# trust-radius interval; factors follow trust_radius.c:47-84).
REG_MIN = 1e-10
REG_MAX = 1e10
REG_FAIL = 1e-4  # floor after a failed (non-SPD) factorization
MAX_LINESEARCH_STEPS = 30


class BlockStructuredProblem:
    """Multistage NLP front end (discrete-time optimal control).

    Parameters
    ----------
    dynamics:    (x, u, t) -> x_next, shape (nx,)
    stage_cost:  (x, u, t) -> scalar
    final_cost:  x -> scalar (optional, default 0)
    x0:          fixed initial state, shape (nx,)
    u_lb, u_ub:  optional control bounds (scalar or (nu,))
    x_lb, x_ub:  optional state bounds (scalar or (nx,)), applied to
                 x_1..x_T (x_0 is fixed); handled by the same
                 reduced-gradient active-set freeze as control bounds

    ``gauss_newton=True`` builds stage Hessians from the costs only
    (guaranteed PSD for convex costs), skipping the dynamics curvature —
    the structured analogue of the reference's Gauss-Newton EQP solver
    (gauss_newton.c).
    """

    def __init__(
        self,
        dynamics: Callable[[Array, Array, Array], Array],
        stage_cost: Callable[[Array, Array, Array], Array],
        num_stages: int,
        num_states: int,
        num_controls: int,
        x0: Any,
        final_cost: Optional[Callable[[Array], Array]] = None,
        u_lb: Any = None,
        u_ub: Any = None,
        x_lb: Any = None,
        x_ub: Any = None,
        gauss_newton: bool = False,
        dtype: Any = jnp.float64,
    ):
        self.dynamics = dynamics
        self.stage_cost = stage_cost
        self.final_cost = final_cost if final_cost is not None else lambda x: 0.0
        self.T = int(num_stages)
        self.nx = int(num_states)
        self.nu = int(num_controls)
        self.nz = self.nx + self.nu
        self.dtype = dtype
        self.x0 = jnp.asarray(x0, dtype=dtype).reshape((self.nx,))
        self.gauss_newton = bool(gauss_newton)

        def _bound(v, fill, dim):
            if v is None:
                return jnp.full((dim,), fill, dtype=dtype)
            arr = jnp.asarray(v, dtype=dtype)
            return jnp.broadcast_to(arr, (dim,))

        self.u_lb = _bound(u_lb, -jnp.inf, self.nu)
        self.u_ub = _bound(u_ub, jnp.inf, self.nu)
        self.x_lb = _bound(x_lb, -jnp.inf, self.nx)
        self.x_ub = _bound(x_ub, jnp.inf, self.nx)
        self.has_bounds = bool(
            jnp.any(jnp.isfinite(self.u_lb)) | jnp.any(jnp.isfinite(self.u_ub))
        )
        self.has_state_bounds = bool(
            jnp.any(jnp.isfinite(self.x_lb)) | jnp.any(jnp.isfinite(self.x_ub))
        )

    # total number of primal variables of the flattened NLP
    @property
    def num_variables(self) -> int:
        return self.T * (self.nx + self.nu)  # x_1..x_T + u_0..u_{T-1}

    # ---- batched stage evaluations (all vmap over t) -------------------

    def rollout(self, U: Array, x0: Optional[Array] = None) -> Array:
        """Forward simulation: X (T+1, nx) with X[0] = x0 (default the
        problem's initial state; pass a traced x0 for scenario batching)."""
        if x0 is None:
            x0 = self.x0

        def step(x, inp):
            u, t = inp
            x_next = self.dynamics(x, u, t)
            return x_next, x_next

        ts = jnp.arange(self.T)
        _, xs = lax.scan(step, x0, (U, ts))
        return jnp.concatenate([x0[None], xs], axis=0)

    def residuals(self, X: Array, U: Array) -> Array:
        """Dynamics defects c_t = f_t(x_t,u_t) - x_{t+1}, shape (T, nx)."""
        ts = jnp.arange(self.T)
        f = jax.vmap(self.dynamics)(X[:-1], U, ts)
        return f - X[1:]

    def total_cost(self, X: Array, U: Array) -> Array:
        ts = jnp.arange(self.T)
        stage = jax.vmap(self.stage_cost)(X[:-1], U, ts)
        return jnp.sum(stage) + jnp.asarray(self.final_cost(X[-1]))

    def merit(self, X: Array, U: Array, penalty: Array) -> Array:
        """l1 exact-penalty merit (reference merit.c:60)."""
        c = self.residuals(X, U)
        return self.total_cost(X, U) + penalty * jnp.sum(jnp.abs(c))

    def linearize(self, X: Array, U: Array, lam: Array, compute_dtype=None):
        """Stage-wise derivatives, vmapped over t.

        Returns (c (T,nx), g (T+1,nz), G (T,nx,nz), H (T+1,nz,nz)) in the
        uniform padded layout: block t < T is z_t = (x_t, u_t); block T is
        (x_T, u_dummy) with identity Hessian / zero gradient on the dummy
        control part.

        ``compute_dtype=float32`` assembles the *second-order* objects —
        the stage Jacobians G (jacfwd) and Hessians H — in hardware-native
        float32 (the returned G/H carry that dtype); the first-order
        quantities c and g stay in the problem dtype so feasibility and
        stationarity checks remain exact.  TPUs emulate float64, so this
        is the measured accelerator configuration (same escalation
        pattern as ``Settings.compute_dtype`` for the LP/Krylov loops).
        The float32 truncation uses a trace-time ``jax.enable_x64(False)``
        scope, which also demotes float64 constants closed over by the
        user's dynamics/cost callables.
        """
        nx, nu, nz, T = self.nx, self.nu, self.nz, self.T
        ts = jnp.arange(T)

        def stage_f(z, t):
            return self.dynamics(z[:nx], z[nx:], t)

        def stage_l(z, t):
            return self.stage_cost(z[:nx], z[nx:], t)

        def stage_lag(z, lam_t, t):
            if self.gauss_newton:
                return stage_l(z, t)
            return stage_l(z, t) + lam_t @ stage_f(z, t)

        Z = jnp.concatenate([X[:-1], U], axis=1)  # (T, nz)
        c = jax.vmap(stage_f)(Z, ts) - X[1:]
        g_stage = jax.vmap(jax.grad(stage_l))(Z, ts)
        gf = jax.grad(self.final_cost)(X[-1])

        mixed = (
            compute_dtype is not None
            and jnp.dtype(compute_dtype) == jnp.float32
            and jnp.dtype(self.dtype) == jnp.float64
        )
        if mixed:
            Zc = Z.astype(jnp.float32)
            lamc = lam.astype(jnp.float32)
            with f32_compute_scope():
                G = jax.vmap(jax.jacfwd(stage_f))(Zc, ts)
                H_stage = jax.vmap(jax.hessian(stage_lag))(Zc, lamc, ts)
                Hf = jax.hessian(self.final_cost)(
                    X[-1].astype(jnp.float32)
                )
            hdtype = jnp.float32
        else:
            G = jax.vmap(jax.jacfwd(stage_f))(Z, ts)  # (T, nx, nz)
            H_stage = jax.vmap(jax.hessian(stage_lag))(Z, lam, ts)
            Hf = jax.hessian(self.final_cost)(X[-1])
            hdtype = self.dtype

        # terminal block, padded to nz with an identity control part
        g_term = jnp.concatenate([jnp.asarray(gf), jnp.zeros((nu,), self.dtype)])
        H_term = jnp.zeros((nz, nz), hdtype)
        H_term = H_term.at[:nx, :nx].set(jnp.asarray(Hf, dtype=hdtype))
        H_term = H_term.at[nx:, nx:].set(jnp.eye(nu, dtype=hdtype))

        g = jnp.concatenate([g_stage, g_term[None]], axis=0)
        H = jnp.concatenate([H_stage.astype(hdtype), H_term[None]], axis=0)
        return c, g, G, H

    def constraint_vjp(self, X: Array, U: Array, lam: Array) -> Array:
        """G^T lam in the padded (T, nz) layout via one reverse pass per
        stage — exact in the problem dtype regardless of the compute
        dtype used for the materialized G (the stationarity residual
        must stay float64-accurate when G is assembled in float32)."""
        nx, T = self.nx, self.T
        ts = jnp.arange(T)

        def stage_f(z, t):
            return self.dynamics(z[:nx], z[nx:], t)

        def pull(z, lam_t, t):
            _, vjp_fn = jax.vjp(lambda zz: stage_f(zz, t), z)
            return vjp_fn(lam_t)[0]

        Z = jnp.concatenate([X[:-1], U], axis=1)
        return jax.vmap(pull)(Z, lam, ts)  # (T, nz)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OCPState:
    """Fixed-shape solver state for the block-structured SQP loop."""

    X: Array  # (T+1, nx)
    U: Array  # (T, nu)
    lam: Array  # (T, nx) dynamics multipliers
    penalty: Array
    reg: Array  # Levenberg regularization (structured trust region)
    iteration: Array  # int32
    status: Array  # int32 Status
    num_accepted: Array
    num_rejected: Array
    obj_val: Array
    feas_res: Array
    stat_res: Array
    last_ratio: Array
    last_alpha: Array


def ocp_initial_state(
    problem: BlockStructuredProblem,
    settings: Settings,
    U0: Optional[Array] = None,
    X0: Optional[Array] = None,
    x0: Optional[Array] = None,
) -> OCPState:
    """Initialize from a control guess (default zeros, clipped to bounds)
    with a dynamics rollout — a feasible multiple-shooting start.

    ``x0`` overrides the problem's initial state; it may be a traced
    array, so scenario batches vmap over initial conditions (the
    structured-path analogue of the reference's independent-solver
    thread test, src/test/thread_test.c:13-110)."""
    T, nx, nu = problem.T, problem.nx, problem.nu
    dtype = problem.dtype
    if U0 is None:
        U0 = jnp.zeros((T, nu), dtype=dtype)
    U0 = jnp.clip(
        jnp.asarray(U0, dtype=dtype).reshape((T, nu)),
        jnp.where(jnp.isfinite(problem.u_lb), problem.u_lb, -jnp.inf),
        jnp.where(jnp.isfinite(problem.u_ub), problem.u_ub, jnp.inf),
    )
    X = problem.rollout(U0, x0=x0) if X0 is None else jnp.asarray(X0, dtype=dtype)
    if problem.has_state_bounds:
        # clip the rolled-out trajectory into the state box (x_0 stays
        # fixed); the merit handles the induced dynamics defects
        X = jnp.concatenate(
            [X[:1], jnp.clip(X[1:], problem.x_lb, problem.x_ub)], axis=0
        )
    zero_i = jnp.asarray(0, jnp.int32)
    return OCPState(
        X=X,
        U=U0,
        lam=jnp.zeros((T, nx), dtype=dtype),
        penalty=jnp.asarray(10.0, dtype=dtype),
        reg=jnp.asarray(1e-6, dtype=dtype),
        iteration=zero_i,
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        num_accepted=zero_i,
        num_rejected=zero_i,
        obj_val=problem.total_cost(X, U0),
        feas_res=jnp.asarray(jnp.inf, dtype=dtype),
        stat_res=jnp.asarray(jnp.inf, dtype=dtype),
        last_ratio=jnp.asarray(0.0, dtype=dtype),
        last_alpha=jnp.asarray(0.0, dtype=dtype),
    )


def _pad_tridiag(S_diag: Array, S_sub: Array, rhs: Array, num_chunks: int):
    """Pad a block-tridiagonal system with identity blocks so that
    N+1 is divisible by num_chunks (sharded SPIKE layout requirement)."""
    N, k, _ = S_diag.shape
    P = num_chunks
    c = -(-(N + 1) // P)  # ceil
    c = max(c, 2)
    Np = P * c - 1
    pad = Np - N
    if pad == 0:
        return S_diag, S_sub, rhs, N
    eye = jnp.broadcast_to(jnp.eye(k, dtype=S_diag.dtype), (pad, k, k))
    S_diag = jnp.concatenate([S_diag, eye], axis=0)
    S_sub = jnp.concatenate(
        [S_sub, jnp.zeros((pad, k, k), S_diag.dtype)], axis=0
    )
    rhs = jnp.concatenate([rhs, jnp.zeros((pad, k), S_diag.dtype)], axis=0)
    return S_diag, S_sub, rhs, N


def _structured_kkt_step(
    problem: BlockStructuredProblem,
    c: Array,
    g: Array,
    G: Array,
    H: Array,
    frozen: Array,
    reg: Array,
    mesh=None,
    mesh_axis: str = "stages",
    tridiag_backend: str = "auto",
):
    """Solve the equality-constrained QP via the dual Schur complement.

        min 1/2 d^T H d + g^T d   s.t.  J d = -c,  d[frozen] = 0

    J row t applies G_t to block t and -P (state selector) to block t+1.
    S = J H^-1 J^T is block-tridiagonal SPD; the solve runs on one device
    (Thomas scan) or across ``mesh`` (SPIKE, parallel/schur.py).

    Returns (d (T+1, nz), lam (T, nx)) in H's dtype: the solve runs in
    the dtype the quadratic model was assembled in (float32 under the
    mixed configuration; callers cast the step back to the problem
    dtype).
    """
    T, nx, nz = problem.T, problem.nx, problem.nz
    dtype = H.dtype
    c = c.astype(dtype)
    g = g.astype(dtype)
    reg = reg.astype(dtype)
    free = (~frozen).astype(dtype)  # (T+1, nz)

    # NOTE: no matmul-precision forcing here — the f32 KKT factors run at
    # the MXU default (bf16 multiplies).  The delta-form outer iteration
    # treats the resulting inexactness as a backward perturbation and
    # still converges to float64 tolerances (measured r3/r4); forcing
    # 6-pass true-f32 cost ~27%/iteration for nothing the f64 residuals
    # could see.  The refinement-based tridiag solve, which DOES need
    # true f32, forces it internally (ops/pallas_tridiag.py).
    return _structured_kkt_core(
        problem, c, g, G, H, free, reg, mesh, mesh_axis, tridiag_backend
    )


def _structured_kkt_core(
    problem, c, g, G, H, free, reg, mesh, mesh_axis, tridiag_backend
):
    T, nx, nz = problem.T, problem.nx, problem.nz
    dtype = H.dtype

    # masked, regularized Hessian blocks: identity on frozen coordinates
    Hm = H * free[:, :, None] * free[:, None, :]
    diag_fix = (1.0 - free) + free * reg
    Hm = Hm + jax.vmap(jnp.diag)(diag_fix)
    gm = g * free
    Gm = G * free[:T, None, :]  # zero frozen columns

    # float32 path: one batched Gauss-Jordan pallas kernel computes all
    # stage-Hessian inverses (XLA's batched Cholesky on (T+1, nz, nz)
    # measured ~11 ms at T=1560/nz=64 vs ~8 ms for the kernel, and the
    # downstream "solves" collapse into einsums).  f64 keeps Cholesky
    # (Mosaic is f32-only; TPU emulates f64 elementwise anyway).
    use_bgj = dtype == jnp.float32 and tridiag_backend in ("auto", "cr")
    if use_bgj:
        from .ops.cyclic_reduction import batched_gj_inverse

        Hinv = batched_gj_inverse(Hm)

        def solve_with(idx, B):
            return jnp.einsum("tij,tjk->tik", Hinv[idx], B)

    else:
        chols = jax.vmap(lambda A: cho_factor(A, lower=True)[0])(Hm)

        def solve_with(idx, B):
            return jax.vmap(lambda Lc, bb: cho_solve((Lc, True), bb))(
                chols[idx], B
            )

    hg = solve_with(slice(None), gm[:, :, None])[:, :, 0]  # H^-1 g
    M = solve_with(slice(None, T), jnp.swapaxes(Gm, 1, 2))  # H^-1 G^T
    # masked state selector: J row t applies -P_t to block t+1, with the
    # columns of *frozen* (bound-active) state coordinates zeroed — the
    # working-set QP moves only free variables (same treatment as G)
    free_x = free[1:, :nx]  # (T, nx)
    Pt = jnp.zeros((nz, nx), dtype).at[:nx, :].set(jnp.eye(nx, dtype=dtype))
    Pm = Pt[None, :, :] * free_x[:, None, :]  # (T, nz, nx) = P_f^T per stage
    Xx = solve_with(slice(1, None), Pm)  # H_{t+1}^-1 P_f^T

    # S_tt = G_t H_t^-1 G_t^T + P_f H_{t+1}^-1 P_f^T
    S_diag = jnp.einsum("tij,tjk->tik", Gm, M) + Xx[:, :nx, :] * free_x[:, :, None]
    # S_{t+1,t} = -G_{t+1} H_{t+1}^-1 P_f^T
    S_sub = -jnp.einsum("tij,tjk->tik", Gm[1:], Xx[:-1])
    # rhs = c - J H^-1 g
    rhs = c - (jnp.einsum("tij,tj->ti", Gm, hg[:T]) - hg[1:, :nx] * free_x)

    if mesh is None:
        if use_bgj:
            # f32 block cyclic reduction: O(log T) levels of batched
            # pallas inverses + MXU einsums (measured 23 ms -> single-
            # digit ms for the 1560-step f32 scan this replaces); one
            # f32 self-refinement restores backward-stable-level
            # residuals over the explicit-inverse levels
            from .ops.cyclic_reduction import cr_factor, cr_resolve
            from .ops.pallas_tridiag import block_tridiag_matvec

            fact = cr_factor(S_diag, S_sub)
            lam = cr_resolve(fact, rhs)
            resid = rhs - block_tridiag_matvec(S_diag, S_sub, lam)
            lam = lam + cr_resolve(fact, resid)
        elif tridiag_backend == "pallas":
            # fused VMEM-resident Pallas Thomas kernel (float32) with
            # iterative refinement back to the problem dtype
            lam = block_tridiag_solve_mp(S_diag, S_sub, rhs)
        elif tridiag_backend == "spike" and dtype == jnp.float32:
            # explicit option: SPIKE cuts the sequential Thomas depth
            # from O(T) to O(sqrt(T)).  NOT the auto choice: measured
            # on-chip at nx=32/T=1560 the extra coupling solves cost
            # more than the depth saves (100.3 vs 78.7 ms/iteration) —
            # the scan's per-step cost is small at k<=32
            from .ops.block_tridiag import spike_block_tridiag_solve
            from .ops.pallas_tridiag import _spike_chunks

            lam = spike_block_tridiag_solve(
                S_diag, S_sub, rhs, _spike_chunks(T)
            )
        else:
            lam = block_tridiag_solve(S_diag, S_sub, rhs)
    else:
        from .parallel.schur import sharded_schur_solve

        P_devices = mesh.shape[mesh_axis]
        Sd, Ss, r, n_true = _pad_tridiag(S_diag, S_sub, rhs, P_devices)
        lam = sharded_schur_solve(
            Sd, Ss, r, mesh, axis_name=mesh_axis,
            tridiag_backend=tridiag_backend,
        )
        lam = lam[:n_true]

    # d = -H^-1 (g + J^T lam)
    jtl = jnp.zeros((T + 1, nz), dtype)
    jtl = jtl.at[:T].add(jnp.einsum("tij,ti->tj", Gm, lam))
    jtl = jtl.at[1:, :nx].add(-lam * free_x)
    d = -solve_with(slice(None), ((gm + jtl))[:, :, None])[:, :, 0]
    return d, lam


def _bound_active_set(V: Array, lb: Array, ub: Array, r: Array, eps: float) -> Array:
    """Bound-active variables to freeze, from the reduced gradient at the
    current duals (the structured stand-in for the reference's LP-basis
    working-set extraction, standard_cauchy.c:843).  Applies to controls
    and (rows 1..T of) states alike.

    At the lower bound a variable stays frozen while its reduced gradient
    (= bound multiplier) is nonnegative, mirroring the basis-status sign
    conventions (lpi_types.h:12-18)."""
    tol_lb = jnp.where(jnp.isfinite(lb), eps * (1.0 + jnp.abs(lb)), -jnp.inf)
    tol_ub = jnp.where(jnp.isfinite(ub), eps * (1.0 + jnp.abs(ub)), -jnp.inf)
    at_lb = jnp.isfinite(lb) & (V <= lb + tol_lb)
    at_ub = jnp.isfinite(ub) & (V >= ub - tol_ub)
    return (at_lb & (r >= 0.0)) | (at_ub & (r <= 0.0))


def _bound_stationarity(V: Array, lb: Array, ub: Array, r: Array) -> Array:
    """Per-entry stationarity measure under simple bounds: at a lower
    bound the multiplier (= r) must be >= 0, at an upper <= 0; free
    entries need r == 0 (iterate.c:499 sign conventions)."""
    eps_scale = 1e-8
    at_lb = jnp.isfinite(lb) & (V <= lb + eps_scale * (1.0 + jnp.abs(lb)))
    at_ub = jnp.isfinite(ub) & (V >= ub - eps_scale * (1.0 + jnp.abs(ub)))
    return jnp.where(
        at_lb,
        jnp.maximum(0.0, -r),
        jnp.where(at_ub, jnp.maximum(0.0, r), jnp.abs(r)),
    )


def _stationarity(
    problem: BlockStructuredProblem,
    X: Array,
    U: Array,
    g: Array,
    Jt_lam: Array,
    lam: Array,
):
    """KKT stationarity residual + reduced gradients.

    r = g + J^T lam on all true variables; bound-active controls/states
    contribute only their complementarity violation (iterate.c:499).
    ``Jt_lam``: G^T lam per stage, (T, nz), in the problem dtype
    (``BlockStructuredProblem.constraint_vjp``)."""
    T, nx, nz = problem.T, problem.nx, problem.nz
    r = jnp.zeros_like(g)
    r = r.at[:T].add(Jt_lam)
    r = r.at[1:, :nx].add(-lam)
    r = r + g
    r_u = r[:T, nx:]  # (T, nu) reduced gradient on controls
    r_x = r[1:, :nx]  # (T, nx) reduced gradient on states x_1..x_T

    stat_u = _bound_stationarity(U, problem.u_lb, problem.u_ub, r_u)
    # x_0 fixed, dummy u_T ignored
    stat_x = _bound_stationarity(X[1:], problem.x_lb, problem.x_ub, r_x)
    stat = jnp.maximum(
        jnp.max(stat_x, initial=0.0), jnp.max(stat_u, initial=0.0)
    )
    return stat, r_u, r_x, r


def ocp_perform_iteration(
    problem: BlockStructuredProblem,
    settings: Settings,
    state: OCPState,
    mesh=None,
    mesh_axis: str = "stages",
    tridiag_backend: str = "auto",
) -> OCPState:
    """One structured SQP iteration (problem_solver/iteration.c:350
    specialized to the block-structured subproblem layers)."""
    T, nx, nz = problem.T, problem.nx, problem.nz
    dtype = problem.dtype
    X, U = state.X, state.U

    # mixed configuration: float32 second-order assembly + KKT solve,
    # float64 state/merit/residuals (TPUs emulate float64; this mirrors
    # Settings.compute_dtype for the LP/Krylov loops)
    cd = (
        jnp.float32
        if settings.compute_dtype == "float32"
        and jnp.dtype(dtype) == jnp.float64
        else None
    )
    c, g, G, H = problem.linearize(X, U, state.lam, compute_dtype=cd)
    feas_res = jnp.max(jnp.abs(c), initial=0.0)
    if cd is None:
        # G is already materialized in the problem dtype — the contraction
        # is exact and free; the extra reverse pass is only needed when G
        # carries float32 accuracy (the stationarity residual must stay
        # float64-exact in the mixed configuration).
        Jt_lam = jnp.einsum("tij,ti->tj", G, state.lam)
    else:
        Jt_lam = problem.constraint_vjp(X, U, state.lam)
    stat_res, r_u, r_x, r_stat = _stationarity(
        problem, X, U, g, Jt_lam, state.lam
    )

    optimal = (feas_res <= settings.feas_tol) & (stat_res <= settings.stat_tol)
    deadpoint = state.reg >= REG_MAX

    # ---- active-set freeze + structured KKT step -----------------------
    frozen = jnp.zeros((T + 1, nz), bool)
    frozen = frozen.at[0, :nx].set(True)  # x_0 fixed
    frozen = frozen.at[T, nx:].set(True)  # dummy terminal control
    if problem.has_bounds:
        frozen = frozen.at[:T, nx:].set(
            _bound_active_set(U, problem.u_lb, problem.u_ub, r_u, settings.eps)
        )
    if problem.has_state_bounds:
        frozen = frozen.at[1:, :nx].set(
            _bound_active_set(
                X[1:], problem.x_lb, problem.x_ub, r_x, settings.eps
            )
        )

    # The QP is solved in *delta form* around the current multiplier:
    # gradient = the float64 stationarity residual r = g + J^T lam
    # (small near convergence), unknowns (d, dlam), lam_qp = lam + dlam.
    # Mathematically identical to the absolute form, but the dual RHS
    # c - J H^-1 r subtracts O(residual) quantities instead of O(1)
    # ones — which is what lets the float32-assembled solve converge to
    # float64 tolerances (no cancellation at the 1e-6 scale).
    d, dlam = _structured_kkt_step(
        problem,
        c,
        r_stat,
        G,
        H,
        frozen,
        state.reg,
        mesh=mesh,
        mesh_axis=mesh_axis,
        tridiag_backend=tridiag_backend,
    )
    d = d.astype(dtype)
    lam_qp = state.lam + dlam.astype(dtype)
    step_ok = jnp.all(jnp.isfinite(d)) & jnp.all(jnp.isfinite(lam_qp))
    d = jnp.where(step_ok, d, 0.0)
    lam_qp = jnp.where(step_ok, lam_qp, state.lam)

    # ---- penalty kept above the multiplier scale (penalty.c:5-50) ------
    lam_norm = jnp.max(jnp.abs(lam_qp), initial=0.0)
    penalty = jnp.where(
        state.penalty >= 1.5 * lam_norm,
        state.penalty,
        jnp.maximum(10.0 * state.penalty, 2.0 * lam_norm),
    )

    # ---- backtracking linesearch on the l1 merit ------------------------
    dX = d[:, :nx]  # (T+1, nx); dX[0] == 0
    dU = d[:T, nx:]
    gd = jnp.sum(g * d)
    dHd = jnp.einsum("ti,tij,tj->", d, H, d)
    viol0 = jnp.sum(jnp.abs(c))
    merit0 = problem.total_cost(X, U) + penalty * viol0
    # directional derivative of the merit: g.d - penalty * ||c||_1
    descent = penalty * viol0 - gd

    def trial_merit(alpha):
        Xa = X + alpha * dX
        if problem.has_state_bounds:
            # clip x_1..x_T into the box; the l1 merit absorbs the
            # resulting dynamics defects (same treatment as controls)
            Xa = jnp.concatenate(
                [Xa[:1], jnp.clip(Xa[1:], problem.x_lb, problem.x_ub)], axis=0
            )
        Ua = jnp.clip(U + alpha * dU, problem.u_lb, problem.u_ub)
        return problem.merit(Xa, Ua, penalty), (Xa, Ua)

    def ls_cond(carry):
        alpha, merit_a, k, done = carry
        return (~done) & (k < MAX_LINESEARCH_STEPS)

    def ls_body(carry):
        alpha, _, k, _ = carry
        merit_a, _ = trial_merit(alpha)
        armijo = merit_a <= merit0 - settings.linesearch_eta * alpha * descent
        next_alpha = jnp.where(armijo, alpha, settings.linesearch_tau * alpha)
        return next_alpha, merit_a, k + 1, armijo

    alpha0 = jnp.asarray(1.0, dtype=dtype)
    has_descent = (descent > 0.0) & step_ok
    alpha, _, _, ls_ok = lax.while_loop(
        ls_cond,
        ls_body,
        (alpha0, merit0, jnp.asarray(0, jnp.int32), ~has_descent),
    )
    accepted = ls_ok & has_descent
    alpha = jnp.where(accepted, alpha, 0.0)

    merit_trial, (X_new, U_new) = trial_merit(alpha)
    # quadratic-model reduction at alpha (merit.c sleqp_merit_quadratic)
    pred = alpha * (penalty * viol0 - gd) - 0.5 * alpha**2 * dHd
    actual = merit0 - merit_trial
    eps10 = 10.0 * jnp.finfo(dtype).eps
    tiny = (jnp.abs(pred) <= eps10) & (jnp.abs(actual) <= eps10)
    ratio = jnp.where(tiny, 1.0, actual / jnp.where(pred == 0.0, 1.0, pred))

    # ---- Levenberg update with the trust_radius.c:47-84 thresholds -----
    reg_accept = jnp.where(
        ratio >= 0.9,
        jnp.maximum(state.reg / 7.0, REG_MIN),
        jnp.where(ratio >= 0.3, jnp.maximum(state.reg / 2.0, REG_MIN), state.reg),
    )
    reg_reject = jnp.minimum(
        jnp.maximum(10.0 * state.reg, REG_FAIL), REG_MAX
    )
    reg_new = jnp.where(accepted, reg_accept, reg_reject)

    X_next = jnp.where(accepted, X_new, X)
    U_next = jnp.where(accepted, U_new, U)
    lam_next = jnp.where(step_ok, lam_qp, state.lam)

    running = OCPState(
        X=X_next,
        U=U_next,
        lam=lam_next,
        penalty=penalty,
        reg=reg_new,
        iteration=state.iteration + 1,
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        num_accepted=state.num_accepted + accepted.astype(jnp.int32),
        num_rejected=state.num_rejected + (~accepted).astype(jnp.int32),
        obj_val=problem.total_cost(X_next, U_next),
        feas_res=feas_res,
        stat_res=stat_res,
        last_ratio=ratio,
        last_alpha=alpha,
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


@partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 6))
def ocp_solve_jit(
    problem: BlockStructuredProblem,
    settings: Settings,
    state0: OCPState,
    max_iterations: int,
    mesh=None,
    mesh_axis: str = "stages",
    tridiag_backend: str = "auto",
) -> OCPState:
    """Full structured solve as one compiled while_loop (solve.c:95-252)."""

    def cond(s):
        return (s.status == Status.RUNNING) & (s.iteration < max_iterations)

    def body(s):
        return ocp_perform_iteration(
            problem,
            settings,
            s,
            mesh=mesh,
            mesh_axis=mesh_axis,
            tridiag_backend=tridiag_backend,
        )

    final = lax.while_loop(cond, body, state0)
    hit_limit = (final.status == Status.RUNNING) & (
        final.iteration >= max_iterations
    )
    return dataclasses.replace(
        final,
        status=jnp.where(hit_limit, Status.ABORT_ITER, final.status).astype(
            jnp.int32
        ),
    )


def ocp_solve(
    problem: BlockStructuredProblem,
    settings: Optional[Settings] = None,
    U0: Optional[Array] = None,
    X0: Optional[Array] = None,
    max_iterations: int = 100,
    mesh=None,
    mesh_axis: str = "stages",
    tridiag_backend: str = "auto",
) -> OCPState:
    """Convenience driver: init + jitted structured solve.

    ``tridiag_backend="pallas"`` routes the dual Schur-complement solve
    through the fused VMEM-resident Pallas Thomas kernel
    (ops/pallas_tridiag.py) with mixed-precision refinement.
    """
    if settings is None:
        settings = Settings()
    state0 = ocp_initial_state(problem, settings, U0=U0, X0=X0)
    return ocp_solve_jit(
        problem, settings, state0, max_iterations, mesh, mesh_axis,
        tridiag_backend,
    )


def batched_ocp_solve(
    problem: BlockStructuredProblem,
    settings: Settings,
    x0_batch: Array,
    max_iterations: int = 100,
) -> OCPState:
    """Scenario batch: vmap independent structured solves over initial
    states (BASELINE config 5 on the block-structured path).  Returns a
    batched OCPState; combine with `jax.sharding` to spread the batch
    over a mesh."""

    def one(x0):
        s0 = ocp_initial_state(problem, settings, x0=x0)
        return ocp_solve_jit(problem, settings, s0, max_iterations)

    return jax.jit(jax.vmap(one))(x0_batch)
