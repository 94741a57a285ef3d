"""Large-scale general sparse NLPs, matrix-free (no Jacobian assembly).

The reference solves general sparse NLPs by assembling the augmented
Jacobian in CSC and factoring it with a sparse direct backend
(aug_jac/standard_aug_jac.c:34-101, sparse/mat.c, src/main/fact/).  The
TPU-native route for *unstructured* sparsity keeps the Jacobian implicit:
every product J v / J^T u is one ``jax.jvp`` / ``jax.vjp`` through the
user's constraint function (cost proportional to the function's own
sparsity, no O(m n) storage), and the working-set EQP solves through a
conjugate-gradient iteration on the same delta-form condensed operator
the banded path factors directly (banded.py::_kkt_solve):

    K = H_lag + reg I + (1/delta) J_W^T J_W   restricted to free vars

Fixed shapes throughout: the working set is a boolean mask over the m
constraint rows, bound-frozen variables are a mask over the n variables,
and the CG loop is a ``lax.while_loop`` with a static iteration cap —
the whole ``sparse_perform_iteration`` is one jit-/vmap-able program.

Globalization mirrors the structured paths (and through them
problem_solver/iteration.c): eps-active working set with wrong-sign dual
drops, reduced-gradient bound freezing, l1 merit + backtracking
linesearch, Levenberg regularization on trust_radius.c thresholds,
penalty kept above the multiplier scale (penalty.c:5-50), and a
Gauss-Newton feasibility-restoration phase on infeasible stalls
(solver/phase.c analogue).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .settings import Settings
from .types import INF_THRESHOLD, SolverPhase, Status

Array = jax.Array

# Augmented-Lagrangian condensation regularization.  The structured
# paths factor K directly, so they run delta ~ 1e-8; a CG solve pays
# cond(K) ~ 1/delta in iterations, so the matrix-free path uses a
# moderate delta and recovers constraint accuracy through AL_ITERS
# multiplier-refinement passes (error contracts ~ delta per pass).
DELTA = 1e-3
AL_ITERS = 3
REG_MIN = 1e-10
REG_FAIL = 1e-6
REG_MAX = 1e8
MAX_LINESEARCH_STEPS = 25
RESTORATION_TRIGGER = 3


class SparseProblem:
    """General NLP consumed matrix-free.

    Parameters
    ----------
    obj:      x -> scalar
    cons:     x -> (m,) constraint values (optional); its Jacobian is
              never materialized — only jvp/vjp products are taken, so
              the evaluation cost (and the implied sparsity) of the
              user's function is the cost of the solver's linear algebra
    var_lb, var_ub, cons_lb, cons_ub: bounds (scalars broadcast)
    cg_iters: CG cap per EQP solve (static; the loop exits early on
              residual convergence)
    cauchy:   working-set discovery strategy.  ``"eps"`` (default)
              tracks epsilon-active rows with wrong-sign dual drops —
              cheap, sufficient when activities are discovered locally
              (the large convex workloads this path targets).
              ``"pdlp"`` solves the reference Cauchy LP
              (standard_cauchy.c:155-244) each iteration with the
              matrix-free PDLP solver (warm-started across SQP
              iterations) and reads the working set off the LP solution
              — the full reference architecture, required when active
              constraints must be discovered at a distance.
    cauchy_iters: PDLP iteration cap per Cauchy solve.
    """

    def __init__(
        self,
        obj: Callable[[Array], Array],
        num_variables: int,
        cons: Optional[Callable[[Array], Array]] = None,
        num_cons: int = 0,
        var_lb: Any = None,
        var_ub: Any = None,
        cons_lb: Any = None,
        cons_ub: Any = None,
        cg_iters: int = 200,
        cauchy: str = "eps",
        cauchy_iters: int = 4000,
        dtype: Any = jnp.float64,
    ):
        if cauchy not in ("eps", "pdlp"):
            raise ValueError(f"unknown cauchy strategy {cauchy!r}")
        self.obj = obj
        self.n = int(num_variables)
        self.cons = cons if cons is not None else (lambda x: jnp.zeros((0,), dtype))
        self.m = int(num_cons)
        self.cg_iters = int(cg_iters)
        self.cauchy = cauchy if num_cons else "eps"
        self.cauchy_iters = int(cauchy_iters)
        self.dtype = dtype

        def bound(v, default, shape):
            if v is None:
                v = default
            return jnp.broadcast_to(jnp.asarray(v, dtype), shape)

        self.var_lb = bound(var_lb, -jnp.inf, (self.n,))
        self.var_ub = bound(var_ub, jnp.inf, (self.n,))
        self.cons_lb = bound(cons_lb, -jnp.inf, (self.m,))
        self.cons_ub = bound(cons_ub, jnp.inf, (self.m,))

    # -- matrix-free products -------------------------------------------

    def obj_grad(self, x: Array) -> Array:
        return jax.grad(self.obj)(x)

    def jvp(self, x: Array, v: Array) -> Array:
        """J(x) v via one forward-mode pass."""
        return jax.jvp(self.cons, (x,), (v,))[1]

    def vjp(self, x: Array, u: Array) -> Array:
        """J(x)^T u via one reverse-mode pass."""
        _, pull = jax.vjp(self.cons, x)
        return pull(u)[0]

    def lag_hess_prod(self, x: Array, lam: Array, v: Array) -> Array:
        """Hessian-of-Lagrangian product via jvp-of-grad (exact AD)."""

        def lag_grad(z):
            g = jax.grad(self.obj)(z)
            if self.m:
                g = g + self.vjp(z, lam)
            return g

        return jax.jvp(lag_grad, (x,), (v,))[1]

    def clip(self, x: Array) -> Array:
        return jnp.clip(x, self.var_lb, self.var_ub)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseState:
    x: Array  # (n,)
    lam: Array  # (m,) constraint duals
    act_low: Array  # (m,) bool
    act_up: Array  # (m,) bool
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
    phase: Array
    bad_steps: Array
    cg_iterations: Array  # cumulative CG iterations (diagnostics)
    feas_steps: Array  # consecutive feasible iterations (penalty reset)
    penalty_resets: Array  # global resets used (capped at 2)
    # Cauchy-LP warm starts + l-inf LP trust radius (cauchy="pdlp";
    # shape-(0,) placeholders otherwise)
    lp_x: Array  # (n + 3m,) PDLP primal
    lp_y: Array  # (m,) PDLP dual
    lp_tr: Array  # scalar


class _MatrixFreeCauchyOp:
    """PDLP operator for the Cauchy LP columns [d, s+, s-, w]:
    rows J d + s+ - s- - w = 0 (standard_cauchy.c:203-244), with J
    applied through jvp/vjp at the current iterate.

    The Ruiz-equilibration hooks need |A|-weighted maxes, which a
    matrix-free J cannot provide exactly; deterministic sign probes
    |J (s .* v)| lower-bound them, which only softens the scaling (PDLP
    stays correct, just less preconditioned)."""

    def __init__(self, problem: SparseProblem, x: Array):
        self.problem = problem
        self.x = x
        n, m = problem.n, problem.m
        self.n, self.m_rows = n, m
        self.shape = (m, n + 3 * m)
        self.dtype = problem.dtype
        bits = jnp.arange(n) % 4
        self.signs = jnp.stack(
            [
                jnp.where((bits // (1 << b)) % 2 == 0, 1.0, -1.0)
                for b in range(2)
            ]
            + [jnp.ones((n,))]
        ).astype(problem.dtype)  # (3, n)
        rbits = jnp.arange(m) % 4
        self.rsigns = jnp.stack(
            [
                jnp.where((rbits // (1 << b)) % 2 == 0, 1.0, -1.0)
                for b in range(2)
            ]
            + [jnp.ones((m,))]
        ).astype(problem.dtype)  # (3, m)

    def _split(self, v):
        n, m = self.n, self.m_rows
        return v[:n], v[n : n + m], v[n + m : n + 2 * m], v[n + 2 * m :]

    def mv(self, v):
        d, sp, sm, w = self._split(v)
        return self.problem.jvp(self.x, d) + sp - sm - w

    def rmv(self, y):
        jt = self.problem.vjp(self.x, y)
        return jnp.concatenate([jt, y, -y, -y])

    def scaled_row_max(self, d_c):
        d, sp, sm, w = self._split(d_c)
        est = jnp.zeros((self.m_rows,), self.dtype)
        for i in range(self.signs.shape[0]):
            est = jnp.maximum(
                est, jnp.abs(self.problem.jvp(self.x, self.signs[i] * d))
            )
        return jnp.maximum(est, jnp.maximum(sp, jnp.maximum(sm, w)))

    def scaled_col_max(self, d_r):
        est = jnp.zeros((self.n,), self.dtype)
        for i in range(self.rsigns.shape[0]):
            est = jnp.maximum(
                est,
                jnp.abs(self.problem.vjp(self.x, self.rsigns[i] * d_r)),
            )
        return jnp.concatenate([est, d_r, d_r, d_r])


def sparse_cauchy(
    problem: SparseProblem,
    x: Array,
    trust_radius: Array,
    penalty: Array,
    lp_x: Optional[Array] = None,
    lp_y: Optional[Array] = None,
    tol: float = 1e-7,
):
    """Reference Cauchy LP, matrix-free (banded.py::banded_cauchy with
    jvp/vjp operators).  Returns (d, act_low, act_up, res)."""
    from .ops import pdlp

    n, m = problem.n, problem.m
    dtype = problem.dtype
    C = problem.cons(x)
    g = problem.obj_grad(x)
    op = _MatrixFreeCauchyOp(problem, x)

    big = jnp.asarray(1e20, dtype)
    vlb, vub = problem.var_lb, problem.var_ub
    d_lb = jnp.maximum(
        jnp.where(vlb < -INF_THRESHOLD, -big, vlb - x), -trust_radius
    )
    d_ub = jnp.minimum(
        jnp.where(vub > INF_THRESHOLD, big, vub - x), trust_radius
    )
    clb, cub = problem.cons_lb, problem.cons_ub
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
        op,
        c_obj,
        lb,
        ub,
        x0=lp_x,
        y0=lp_y,
        tol=tol,
        max_iterations=problem.cauchy_iters,
    )
    d = res.x[:n]

    # working-set extraction (standard_cauchy.c:843-1005 semantics via
    # the first-order solution: logical column at bound + non-
    # contradicting dual; equalities always active)
    eps = 1e-6
    w = res.x[n + 2 * m :]
    duals = res.duals
    prox = jnp.maximum(eps, 10.0 * res.primal_res)
    at_wlb = (clb > -INF_THRESHOLD) & (
        w <= w_lb + prox * (1.0 + jnp.abs(w_lb))
    )
    at_wub = (cub < INF_THRESHOLD) & (
        w >= w_ub - prox * (1.0 + jnp.abs(w_ub))
    )
    is_eq = jnp.abs(cub - clb) <= 1e-12 * (1.0 + jnp.abs(clb))
    act_low = is_eq | (at_wlb & (duals >= -eps))
    act_up = (~is_eq) & (at_wub & (duals <= eps)) & ~act_low
    return d, act_low, act_up, res


def _violation(problem: SparseProblem, C: Array) -> Array:
    lo = jnp.maximum(problem.cons_lb - C, 0.0)
    lo = jnp.where(problem.cons_lb < -INF_THRESHOLD, 0.0, lo)
    hi = jnp.maximum(C - problem.cons_ub, 0.0)
    hi = jnp.where(problem.cons_ub > INF_THRESHOLD, 0.0, hi)
    return lo + hi


def sparse_initial_state(
    problem: SparseProblem, settings: Settings, x0: Array
) -> SparseState:
    dtype = problem.dtype
    x = problem.clip(jnp.asarray(x0, dtype))
    m = problem.m
    zero = jnp.asarray(0.0, dtype)
    if problem.cauchy == "pdlp":
        lp_x = jnp.zeros((problem.n + 3 * m,), dtype)
        lp_y = jnp.zeros((m,), dtype)
    else:
        lp_x = jnp.zeros((0,), dtype)
        lp_y = jnp.zeros((0,), dtype)
    return SparseState(
        x=x,
        lam=jnp.zeros((m,), dtype),
        act_low=jnp.zeros((m,), bool),
        act_up=jnp.zeros((m,), bool),
        penalty=jnp.asarray(10.0, dtype),
        reg=jnp.asarray(1e-8, dtype),
        iteration=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        num_accepted=jnp.asarray(0, jnp.int32),
        num_rejected=jnp.asarray(0, jnp.int32),
        obj_val=problem.obj(x),
        feas_res=zero,
        stat_res=zero,
        last_ratio=zero,
        last_alpha=zero,
        phase=jnp.asarray(SolverPhase.OPTIMIZATION, jnp.int32),
        bad_steps=jnp.asarray(0, jnp.int32),
        cg_iterations=jnp.asarray(0, jnp.int32),
        feas_steps=jnp.asarray(0, jnp.int32),
        penalty_resets=jnp.asarray(0, jnp.int32),
        lp_x=lp_x,
        lp_y=lp_y,
        lp_tr=jnp.asarray(1.0, dtype),
    )


def _cg(matvec, b, tol, max_iters, dtype, x0=None):
    """Plain CG with a static iteration cap and residual early-exit.

    Returns (x, iterations).  Fixed shapes; jit/vmap-safe.
    """
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
        r0 = b
    else:
        r0 = b - matvec(x0)
    bnorm2 = jnp.sum(b * b)
    tol2 = (tol * tol) * jnp.maximum(bnorm2, jnp.asarray(1e-300, dtype))

    def cond(carry):
        x, r, p, rs, it, neg = carry
        return (rs > tol2) & (it < max_iters) & ~neg

    def body(carry):
        x, r, p, rs, it, _ = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        # negative curvature: stop with the current (descent) iterate —
        # truncated CG; the caller's Levenberg loop convexifies next
        # round (the structured stand-in for Steihaug's boundary step)
        neg = pAp <= 0.0
        alpha = jnp.where(neg, 0.0, rs / jnp.where(neg, 1.0, pAp))
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / rs
        p = r + beta * p
        return x, r, p, rs_new, it + 1, neg

    x, r, p, rs, it, _ = lax.while_loop(
        cond,
        body,
        (
            x0,
            r0,
            r0,
            jnp.sum(r0 * r0),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        ),
    )
    return x, it


def _kkt_solve_cg(
    problem: SparseProblem,
    x: Array,
    lam_act: Array,
    act: Array,
    target: Array,
    g_eff: Array,
    frozen: Array,
    reg: Array,
    cg_tol,
    mixed: bool = False,
):
    """Delta-form condensed EQP via matrix-free CG.

    minimize 1/2 d^T (H + reg I) d + g_eff^T d
        s.t. J_W d = target (active rows), d_frozen = 0

    through K = H + reg I + (1/delta) J_W^T J_W (SPD on the free
    subspace); returns (d, dlam, cg_iters) with dlam the multiplier
    INCREMENT (callers form lam_qp = lam_act + dlam), exactly the
    banded path's formulation (banded.py::_kkt_solve).

    ``mixed=True`` (Settings.compute_dtype="float32" on a float64
    problem) runs the bulk CG iterations through a float32-traced
    operator — on TPU the f64 jvp/vjp matvecs are software-emulated and
    measured ~20x slower than f32 at n = 5e4 — and finishes with a
    float64 CG polish warm-started from the f32 solution, so the
    returned step carries float64 accuracy.
    """
    from .types import f32_compute_scope

    dtype = problem.dtype
    free = (~frozen).astype(dtype)
    actf = act.astype(dtype)
    inv_delta = jnp.asarray(1.0 / DELTA, dtype)

    def K(v):
        vf = v * free
        Hv = problem.lag_hess_prod(x, lam_act, vf)
        out = Hv + reg * vf
        if problem.m:
            Jv = problem.jvp(x, vf) * actf
            out = out + inv_delta * problem.vjp(x, Jv)
        return out * free

    if mixed:
        # float32-traced copy of K: enable_x64(False) at trace time
        # demotes the f64 constants closed over by the user's functions
        with f32_compute_scope():
            x32 = x.astype(jnp.float32)
            lam32 = lam_act.astype(jnp.float32)
            free32 = free.astype(jnp.float32)
            act32 = actf.astype(jnp.float32)
            reg32 = reg.astype(jnp.float32)
            invd32 = jnp.asarray(1.0 / DELTA, jnp.float32)

            def K32(v):
                vf = v * free32
                Hv = problem.lag_hess_prod(x32, lam32, vf)
                out = Hv + reg32 * vf
                if problem.m:
                    Jv = problem.jvp(x32, vf) * act32
                    out = out + invd32 * problem.vjp(x32, Jv)
                return out * free32

    def solve_K(rhs, x0, final: bool):
        """One inner solve: f32 bulk + (on the final AL pass) f64 polish."""
        if not mixed:
            return _cg(K, rhs, cg_tol, problem.cg_iters, dtype, x0=x0)
        with f32_compute_scope():
            d32, it = _cg(
                K32,
                rhs.astype(jnp.float32),
                jnp.asarray(1e-7, jnp.float32),
                problem.cg_iters,
                jnp.float32,
                x0=x0.astype(jnp.float32),
            )
        d = d32.astype(dtype)
        if final:
            d2, it2 = _cg(
                K, rhs, cg_tol, max(problem.cg_iters // 4, 25), dtype, x0=d
            )
            return d2, it + it2
        return d, it

    if not problem.m:
        d, it = solve_K(
            -(g_eff * free), jnp.zeros((problem.n,), dtype), final=True
        )
        return d * free, jnp.zeros((0,), dtype), it

    # AL multiplier refinement: each pass solves the moderately
    # regularized K and tightens J_W d = target by ~delta (the direct
    # structured paths get this in one shot at delta ~ 1e-8; CG cannot
    # afford that conditioning)
    dlam = jnp.zeros((problem.m,), dtype)
    d = jnp.zeros((problem.n,), dtype)
    it_total = jnp.asarray(0, jnp.int32)
    for k_al in range(AL_ITERS):
        rhs = -(g_eff * free) + problem.vjp(
            x, (inv_delta * target - dlam) * actf
        ) * free
        d, it = solve_K(rhs, d, final=k_al == AL_ITERS - 1)
        d = d * free
        Jd = problem.jvp(x, d)
        dlam = dlam + (Jd - target) * inv_delta * actf
        it_total = it_total + it
    return d, dlam, it_total


def _optimality_iteration(
    problem: SparseProblem, settings: Settings, state: SparseState
) -> SparseState:
    """One matrix-free SQP iteration (problem_solver/iteration.c:350 with
    the subproblem layers replaced by jvp/vjp CG solves)."""
    dtype = problem.dtype
    x = state.x
    m = problem.m

    g = problem.obj_grad(x)
    C = problem.cons(x)
    viol = _violation(problem, C)
    feas_res = jnp.max(viol, initial=0.0)

    # ---- working set ---------------------------------------------------
    tol_act = settings.eps * 1e4
    scale_lo = 1.0 + jnp.abs(problem.cons_lb)
    is_eq = jnp.abs(problem.cons_ub - problem.cons_lb) <= 1e-12 * scale_lo
    if problem.cauchy == "pdlp":
        # reference architecture: the Cauchy LP discovers the working
        # set each iteration (warm-started matrix-free PDLP)
        _, act_low, act_up, lp_res = sparse_cauchy(
            problem,
            x,
            state.lp_tr,
            state.penalty,
            lp_x=state.lp_x,
            lp_y=state.lp_y,
        )
        lp_x_next, lp_y_next = lp_res.x, lp_res.duals
    else:
        # eps-active + wrong-sign dual drop (cheap local discovery)
        scale_hi = 1.0 + jnp.abs(problem.cons_ub)
        near_lo = (problem.cons_lb > -INF_THRESHOLD) & (
            C <= problem.cons_lb + tol_act * scale_lo
        )
        near_up = (problem.cons_ub < INF_THRESHOLD) & (
            C >= problem.cons_ub - tol_act * scale_hi
        )
        wrong_lo = state.act_low & ~is_eq & (state.lam > tol_act)
        wrong_up = state.act_up & (state.lam < -tol_act)
        act_low = is_eq | (near_lo & ~wrong_lo) | (state.act_low & ~wrong_lo)
        act_up = (
            (~is_eq)
            & ((near_up & ~wrong_up) | (state.act_up & ~wrong_up))
            & ~act_low
        )
        lp_x_next, lp_y_next = state.lp_x, state.lp_y
    act = act_low | act_up

    target = jnp.where(
        act_low,
        problem.cons_lb - C,
        jnp.where(act_up, problem.cons_ub - C, 0.0),
    )

    # ---- bound freeze via reduced gradient ----------------------------
    lam_act = state.lam * act.astype(dtype)
    r = g + problem.vjp(x, lam_act) if m else g
    at_lb = (problem.var_lb > -INF_THRESHOLD) & (
        x <= problem.var_lb + settings.eps * (1.0 + jnp.abs(problem.var_lb))
    )
    at_ub = (problem.var_ub < INF_THRESHOLD) & (
        x >= problem.var_ub - settings.eps * (1.0 + jnp.abs(problem.var_ub))
    )
    frozen = (at_lb & (r > 0.0)) | (at_ub & (r < 0.0))

    stat_res = jnp.max(jnp.abs(jnp.where(frozen, 0.0, r)), initial=0.0)
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
    infeasible_now = feas_res > settings.feas_tol
    deadpoint = (state.reg >= REG_MAX) & ~infeasible_now

    # ---- EQP step via CG ----------------------------------------------
    cg_tol = jnp.asarray(1e-10, dtype)
    mixed = (
        settings.compute_dtype == "float32"
        and jnp.dtype(dtype) == jnp.float64
    )
    d, dlam, cg_it = _kkt_solve_cg(
        problem, x, lam_act, act, target, r, frozen, state.reg, cg_tol,
        mixed=mixed,
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
    # global penalty reset after 5 consecutive feasible iterations, at
    # most twice (trial_point/cauchy_step.c:33-95, iteration.c:10-11):
    # a transient dual spike must not ratchet the merit weight forever —
    # an oversized penalty forces vanishing linesearch steps on any
    # curved constraint manifold
    feas_now = feas_res <= settings.feas_tol
    feas_steps = jnp.where(feas_now, state.feas_steps + 1, 0)
    fresh = jnp.maximum(1.5 * lam_norm, 10.0)
    can_reset = (
        (feas_steps >= 5)
        & (state.penalty_resets < 2)
        & (penalty > 10.0 * fresh)
    )
    penalty = jnp.where(can_reset, fresh, penalty)
    penalty_resets = state.penalty_resets + can_reset.astype(jnp.int32)
    feas_steps = jnp.where(can_reset, 0, feas_steps)

    # ---- l1 merit + backtracking linesearch ---------------------------
    gd = jnp.sum(g * d)
    dHd = jnp.sum(d * problem.lag_hess_prod(x, lam_act, d))
    viol0 = jnp.sum(viol)
    merit0 = state.obj_val + penalty * viol0

    def trial_merit(alpha):
        xa = problem.clip(x + alpha * d)
        viol_a = jnp.sum(_violation(problem, problem.cons(xa)))
        return problem.obj(xa) + penalty * viol_a, xa

    descent = penalty * viol0 - gd
    has_descent = (descent > 0.0) & step_ok

    def ls_cond(carry):
        alpha, merit_a, kk, done = carry
        return (~done) & (kk < MAX_LINESEARCH_STEPS)

    def ls_body(carry):
        alpha, _, kk, _ = carry
        merit_a, _ = trial_merit(alpha)
        armijo = merit_a <= merit0 - settings.linesearch_eta * alpha * descent
        next_alpha = jnp.where(armijo, alpha, settings.linesearch_tau * alpha)
        return next_alpha, merit_a, kk + 1, armijo

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

    merit_trial, x_new = trial_merit(alpha)
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

    x_next = jnp.where(accepted, x_new, x)
    lam_next = jnp.where(accepted & step_ok, lam_qp, state.lam)

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

    # l-inf LP radius by step quality (trust_radius.c:5-45 shape)
    step_norm = jnp.max(jnp.abs(d), initial=0.0)
    lp_tr_next = jnp.clip(
        jnp.where(
            accepted,
            jnp.where(
                ratio >= 0.9,
                jnp.maximum(state.lp_tr, 2.0 * step_norm),
                state.lp_tr,
            ),
            0.5 * state.lp_tr,
        ),
        1e-10,
        1e10,
    )

    running = SparseState(
        x=x_next,
        lam=lam_next,
        act_low=act_low,
        act_up=act_up,
        penalty=penalty,
        reg=reg_next,
        iteration=state.iteration + 1,
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        num_accepted=state.num_accepted + accepted.astype(jnp.int32),
        num_rejected=state.num_rejected + (~accepted).astype(jnp.int32),
        obj_val=problem.obj(x_next),
        feas_res=feas_res,
        stat_res=stat_res,
        last_ratio=ratio,
        last_alpha=alpha,
        phase=phase_next,
        bad_steps=bad_steps,
        cg_iterations=state.cg_iterations + cg_it,
        feas_steps=feas_steps,
        penalty_resets=penalty_resets,
        lp_x=lp_x_next,
        lp_y=lp_y_next,
        lp_tr=lp_tr_next,
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
    problem: SparseProblem, settings: Settings, state: SparseState
) -> SparseState:
    """Matrix-free Gauss-Newton feasibility restoration (restoration.c
    analogue; identity prox metric, violated rows as working set)."""
    dtype = problem.dtype
    x = state.x
    C = problem.cons(x)
    viol = _violation(problem, C)
    phi0 = jnp.sum(viol)
    feas_res = jnp.max(viol, initial=0.0)

    below = (problem.cons_lb > -INF_THRESHOLD) & (C < problem.cons_lb)
    above = (problem.cons_ub < INF_THRESHOLD) & (C > problem.cons_ub)
    act = below | above
    target = jnp.where(
        below,
        problem.cons_lb - C,
        jnp.where(above, problem.cons_ub - C, 0.0),
    )
    actf = act.astype(dtype)
    inv_delta = jnp.asarray(1.0 / DELTA, dtype)

    def K(v):
        Jv = problem.jvp(x, v) * actf
        return v * (1.0 + state.reg) + inv_delta * problem.vjp(x, Jv)

    rhs = inv_delta * problem.vjp(x, target * actf)
    d, cg_it = _cg(
        K, rhs, jnp.asarray(1e-10, dtype), problem.cg_iters, dtype
    )
    step_ok = jnp.all(jnp.isfinite(d))
    d = jnp.where(step_ok, d, 0.0)

    Jd = problem.jvp(x, d)
    viol_lin = _violation(problem, C + Jd)
    descent = phi0 - jnp.sum(viol_lin)
    has_descent = (descent > 0.0) & step_ok

    def trial(alpha):
        xa = problem.clip(x + alpha * d)
        return jnp.sum(_violation(problem, problem.cons(xa))), xa

    def ls_cond(carry):
        alpha, phi_a, kk, done = carry
        return (~done) & (kk < MAX_LINESEARCH_STEPS)

    def ls_body(carry):
        alpha, _, kk, _ = carry
        phi_a, _ = trial(alpha)
        armijo = phi_a <= phi0 - settings.linesearch_eta * alpha * descent
        next_alpha = jnp.where(armijo, alpha, settings.linesearch_tau * alpha)
        return next_alpha, phi_a, kk + 1, armijo

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
    _, x_new = trial(alpha)
    x_next = jnp.where(accepted, x_new, x)

    reg_new = jnp.where(
        accepted,
        jnp.maximum(state.reg / 7.0, REG_MIN),
        jnp.minimum(jnp.maximum(10.0 * state.reg, REG_FAIL), REG_MAX),
    )

    feas_new = jnp.max(
        _violation(problem, problem.cons(x_next)), initial=0.0
    )
    restored = feas_new <= settings.feas_tol
    locally_infeasible = (state.reg >= REG_MAX) & ~restored

    running = dataclasses.replace(
        state,
        x=x_next,
        iteration=state.iteration + 1,
        num_accepted=state.num_accepted + accepted.astype(jnp.int32),
        num_rejected=state.num_rejected + (~accepted).astype(jnp.int32),
        obj_val=problem.obj(x_next),
        feas_res=feas_new,
        phase=jnp.where(
            restored, SolverPhase.OPTIMIZATION, SolverPhase.RESTORATION
        ).astype(jnp.int32),
        penalty=jnp.where(restored, state.penalty * 10.0, state.penalty),
        reg=jnp.where(restored, jnp.asarray(1e-8, dtype), reg_new),
        cg_iterations=state.cg_iterations + cg_it,
    )
    stopped = dataclasses.replace(
        state,
        status=jnp.asarray(Status.INFEASIBLE, jnp.int32),
        feas_res=feas_new,
    )
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(locally_infeasible, a, b), stopped, running
    )


def sparse_perform_iteration(
    problem: SparseProblem, settings: Settings, state: SparseState
) -> SparseState:
    """Phase-dispatched iteration; pure SparseState -> SparseState."""
    return lax.cond(
        state.phase == SolverPhase.RESTORATION,
        lambda s: _restoration_iteration(problem, settings, s),
        lambda s: _optimality_iteration(problem, settings, s),
        state,
    )


def sparse_solve_jit(
    problem: SparseProblem,
    settings: Settings,
    state0: SparseState,
    max_iterations: int,
) -> SparseState:
    def cond(s):
        return (s.status == Status.RUNNING) & (s.iteration < max_iterations)

    def body(s):
        return sparse_perform_iteration(problem, settings, s)

    final = lax.while_loop(cond, body, state0)
    return dataclasses.replace(
        final,
        status=jnp.where(
            final.status == Status.RUNNING,
            jnp.asarray(Status.ABORT_ITER, jnp.int32),
            final.status,
        ),
    )


def sparse_solve(
    problem: SparseProblem,
    settings: Optional[Settings] = None,
    x0: Optional[Array] = None,
    max_iterations: int = 200,
) -> SparseState:
    """Solve a general sparse NLP matrix-free; returns the final state."""
    settings = settings or Settings()
    if x0 is None:
        x0 = jnp.zeros((problem.n,), problem.dtype)
    state0 = sparse_initial_state(problem, settings, x0)
    return sparse_solve_jit(problem, settings, state0, max_iterations)
