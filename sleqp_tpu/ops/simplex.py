"""Fixed-shape bounded-variable revised simplex.

TPU-native replacement for the reference's external LP backends
(src/main/lp/: Gurobi/HiGHS/SoPlex behind the SleqpLPi vtable,
lp/lpi_types.h:100-118).  The Cauchy subproblem needs exactly the features
the vtable exposes: warm starts from a saved basis, primal & dual solutions,
and per-column/row basis statuses for working-set extraction.

Problem form (all shapes static => jit/vmap-able):

    min  c^T x   s.t.  A x = 0,   lb <= x <= ub

where the caller has already appended *logical* columns (-I) for ranged
rows, so every row is an equality and row "basis status" is the status of
its logical column.  Bounds use +-1e20 as infinity (types.INF).

Algorithm: revised simplex with an explicitly maintained basis inverse
(eta-style rank-1 updates, periodic refactorization via Householder QR),
**Devex pricing** (Forrest-Goldfarb reference weights, the steepest-edge
approximation used by production LP codes — measured ~2x fewer pivots than
Dantzig on large penalty-LP geometry) with an automatic switch to Bland's rule
after a stall to guarantee anti-cycling, and bound-flip ("type-2")
iterations for boxed columns.  The whole solve is one `lax.while_loop`;
each iteration is O(m*N) dense linear algebra that maps onto the MXU/VPU,
in contrast to the pointer-chasing sparse pivoting of CPU LP codes.

Warm starting: pass the `status` vector from a previous solve; the caller
is responsible for providing a *primal-feasible* basis (the Cauchy layer
repairs row columns via `crash_slack_basis`, mirroring the reference's
slack-basis construction at cauchy/standard_cauchy.c:71-133).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import INF_THRESHOLD, BaseStat

Array = jax.Array

# Status codes returned by solve()
OPTIMAL = 0
ITERATION_LIMIT = 1
UNBOUNDED = 2
DUAL_STALL = 3  # dual ratio test found no entering column


class SimplexResult(NamedTuple):
    x: Array  # (N,) primal solution
    duals: Array  # (m,) row duals y (c_B^T B^-1)
    reduced_costs: Array  # (N,) c - A^T y
    status: Array  # (N,) int8 per-column BaseStat
    basis: Array  # (m,) int32 basic column per row
    obj: Array  # scalar objective value
    state: Array  # int32: OPTIMAL / ITERATION_LIMIT / UNBOUNDED
    iterations: Array  # int32 pivot count
    condition: Array  # 1-norm condition estimate of the final basis


def _finite(v: Array) -> Array:
    return jnp.abs(v) < INF_THRESHOLD


def default_tols(dtype) -> dict:
    """Pivoting tolerances by working precision.

    The float64 values are the tuned defaults of round 1; the float32
    values back off to ~100x machine eps — the compute-precision path
    (mixed-precision solves) refines every numeric quantity in float64
    afterwards, so the float32 run only needs to get the *basis* right.
    """
    if jnp.dtype(dtype) == jnp.float32:
        return dict(
            opt_tol=1e-5, piv_tol=1e-6, feas_tol=1e-5, degen_tol=1e-7
        )
    return dict(opt_tol=1e-9, piv_tol=1e-11, feas_tol=1e-9, degen_tol=1e-12)


def _nonbasic_value(status: Array, lb: Array, ub: Array) -> Array:
    """Value each nonbasic column rests at (basic columns -> 0 here)."""
    at_lower = jnp.where(_finite(lb), lb, 0.0)
    at_upper = jnp.where(_finite(ub), ub, 0.0)
    val = jnp.where(status == BaseStat.LOWER, at_lower, 0.0)
    val = jnp.where(status == BaseStat.UPPER, at_upper, val)
    return val


def qr_solve(B: Array, rhs: Array) -> Array:
    """Dense solve via Householder QR.

    Used instead of ``jnp.linalg.solve`` throughout the LP path: the TPU
    compiler implements LuDecomposition only for F32/C64, while QR +
    triangular solve lower to HLO for every float type — this keeps the
    float64 solver compilable on real TPU chips.  Singular systems yield
    inf/nan (callers check finiteness), matching LU behavior.
    """
    q, r = jnp.linalg.qr(B)
    return jax.scipy.linalg.solve_triangular(r, q.T @ rhs)


def _recompute(A: Array, basis: Array, status: Array, lb: Array, ub: Array):
    """Refactorize: B_inv and basic values from scratch."""
    B = A[:, basis]
    m = A.shape[0]
    B_inv = qr_solve(B, jnp.eye(m, dtype=A.dtype))
    xN = _nonbasic_value(status, lb, ub)
    xB = -B_inv @ (A @ xN)
    return B_inv, xB


class DualStageResult(NamedTuple):
    basis: Array  # (m,) int32
    status: Array  # (N,) int8
    state: Array  # int32: OPTIMAL / ITERATION_LIMIT / DUAL_STALL
    iterations: Array  # int32 pivot count


def solve_dual(
    A: Array,
    c: Array,
    lb: Array,
    ub: Array,
    basis: Array,
    status: Array,
    max_iterations: int,
    feas_tol: float | None = None,
    piv_tol: float | None = None,
    refactor_every: int = 64,
    bland_after: int = 100,
) -> DualStageResult:
    """Bounded-variable dual simplex from a dual-feasible basis.

    The warm-start workhorse: when the SQP loop shrinks the LP trust
    radius (a rejected step) or sweeps it (parametric Cauchy), the LP
    data change only in the *bounds* — the saved basis keeps its reduced
    costs and therefore stays dual feasible while turning primal
    infeasible.  Dual pivots drive the primal infeasibility out in a few
    iterations instead of rebuilding from a crash (slack) basis.  The
    reference gets this behavior for free from its LP backends' internal
    warm-start logic (lpi vtable save/restore, lp/lpi_types.h:60-67);
    here it is explicit.

    Runs until primal feasible (state=OPTIMAL: since dual feasibility is
    maintained, the basis is then optimal), the iteration cap, or a
    failed dual ratio test (DUAL_STALL — numerically lost dual
    feasibility; the caller falls back to a crash basis).
    """
    m, N = A.shape
    dtype = A.dtype
    tols = default_tols(dtype)
    feas_tol = tols["feas_tol"] if feas_tol is None else feas_tol
    piv_tol = tols["piv_tol"] if piv_tol is None else piv_tol
    basis = jnp.asarray(basis, dtype=jnp.int32)
    status = jnp.asarray(status, dtype=jnp.int8)

    B_inv, xB = _recompute(A, basis, status, lb, ub)
    ptol = feas_tol * (1.0 + jnp.max(jnp.abs(jnp.where(_finite(lb), lb, 0.0)))
                       + jnp.max(jnp.abs(jnp.where(_finite(ub), ub, 0.0))))
    col_idx = jnp.arange(N, dtype=jnp.int32)

    init = dict(
        B_inv=B_inv,
        xB=xB,
        basis=basis,
        status=status,
        it=jnp.asarray(0, jnp.int32),
        stall=jnp.asarray(0, jnp.int32),
        state=jnp.asarray(-1, jnp.int32),
    )

    def cond(s):
        return jnp.logical_and(s["state"] < 0, s["it"] < max_iterations)

    def body(s):
        B_inv, xB, basis, status = s["B_inv"], s["xB"], s["basis"], s["status"]
        lbB, ubB = lb[basis], ub[basis]

        # ---- leaving-row pricing: largest bound violation --------------
        viol_low = jnp.where(_finite(lbB), lbB - xB, -jnp.inf)
        viol_up = jnp.where(_finite(ubB), xB - ubB, -jnp.inf)
        viol = jnp.maximum(viol_low, viol_up)
        use_bland = s["stall"] > bland_after
        r_most = jnp.argmax(viol)
        r_bland = jnp.argmin(jnp.where(viol > ptol, basis, N + 1))
        row_r = jnp.where(use_bland, r_bland, r_most).astype(jnp.int32)
        primal_feasible = viol[r_most] <= ptol

        below = viol_low[row_r] >= viol_up[row_r]  # leaves at its LOWER bound
        target = jnp.where(below, lbB[row_r], ubB[row_r])

        # ---- dual ratio test over the tableau row -----------------------
        y = c[basis] @ B_inv
        red = c - y @ A  # reduced costs (dual feasible up to drift)
        alpha = B_inv[row_r] @ A  # tableau row, O(mN)
        q_dir = jnp.where(below, 1.0, -1.0)  # required movement of xB[r]

        is_basic = status == BaseStat.BASIC
        at_lower = status == BaseStat.LOWER
        at_upper = status == BaseStat.UPPER
        free = status == BaseStat.ZERO
        # raising a LOWER col changes xB[r] by -alpha; lowering an UPPER
        # col by +alpha; free columns move either way
        can_help = (
            (at_lower & (alpha * q_dir < -piv_tol))
            | (at_upper & (alpha * q_dir > piv_tol))
            | (free & (jnp.abs(alpha) > piv_tol))
        ) & ~is_basic

        ratio = jnp.where(can_help, jnp.abs(red) / jnp.abs(alpha), jnp.inf)
        any_help = jnp.any(can_help)
        best = jnp.min(ratio)
        near = can_help & (ratio <= best * (1.0 + 1e-9) + 1e-30)
        stab = jnp.where(near, jnp.abs(alpha), -1.0)
        e_stab = jnp.argmax(stab)
        e_bland = jnp.min(jnp.where(near, col_idx, N))
        e = jnp.where(
            use_bland, jnp.minimum(e_bland, N - 1), e_stab
        ).astype(jnp.int32)

        # ---- pivot -------------------------------------------------------
        w = B_inv @ A[:, e]
        w_r = w[row_r]
        safe_wr = jnp.where(jnp.abs(w_r) > piv_tol, w_r, 1.0)
        t_e = (xB[row_r] - target) / safe_wr  # signed entering movement
        e_rest = _nonbasic_value(status, lb, ub)[e]

        xB_new = xB - t_e * w
        xB_new = xB_new.at[row_r].set(e_rest + t_e)

        leaving = basis[row_r]
        leave_stat = jnp.where(below, BaseStat.LOWER, BaseStat.UPPER).astype(
            jnp.int8
        )
        status_new = status.at[leaving].set(leave_stat)
        status_new = status_new.at[e].set(jnp.int8(BaseStat.BASIC))
        basis_new = basis.at[row_r].set(e)

        pivot_row = B_inv[row_r] / safe_wr
        B_inv_new = B_inv - jnp.outer(w, pivot_row)
        B_inv_new = B_inv_new.at[row_r].set(pivot_row)

        done = primal_feasible
        stalled = (~done) & (~any_help)
        step = (~done) & any_help

        basis_next = jnp.where(step, basis_new, basis)
        status_next = jnp.where(step, status_new, status)
        B_inv_next = jnp.where(step, B_inv_new, B_inv)
        xB_next = jnp.where(step, xB_new, xB)

        it_next = s["it"] + step.astype(jnp.int32)
        do_refac = step & (it_next % refactor_every == 0)

        def refac(_):
            return _recompute(A, basis_next, status_next, lb, ub)

        B_inv_next, xB_next = lax.cond(
            do_refac, refac, lambda _: (B_inv_next, xB_next), operand=None
        )

        degenerate = jnp.abs(red[e]) <= piv_tol
        stall_next = jnp.where(
            step & degenerate, s["stall"] + 1, jnp.where(step, 0, s["stall"])
        )
        state_next = jnp.where(
            done, OPTIMAL, jnp.where(stalled, DUAL_STALL, s["state"])
        ).astype(jnp.int32)

        return dict(
            B_inv=B_inv_next,
            xB=xB_next,
            basis=basis_next,
            status=status_next,
            it=it_next,
            stall=stall_next,
            state=state_next,
        )

    final = lax.while_loop(cond, body, init)
    state = jnp.where(final["state"] < 0, ITERATION_LIMIT, final["state"])
    return DualStageResult(
        basis=final["basis"],
        status=final["status"],
        state=state,
        iterations=final["it"],
    )


def solve(
    A: Array,
    c: Array,
    lb: Array,
    ub: Array,
    basis: Array,
    status: Array,
    max_iterations: int,
    opt_tol: float | None = None,
    piv_tol: float | None = None,
    refactor_every: int = 64,
    bland_after: int = 100,
) -> SimplexResult:
    """Run the simplex from a primal-feasible starting basis.

    ``basis[i]`` is the column basic in row i; ``status`` must satisfy
    ``status[basis] == BASIC`` and mark every other column LOWER/UPPER/ZERO.
    """
    m, N = A.shape
    dtype = A.dtype
    tols = default_tols(dtype)
    opt_tol = tols["opt_tol"] if opt_tol is None else opt_tol
    piv_tol = tols["piv_tol"] if piv_tol is None else piv_tol
    degen_tol = tols["degen_tol"]
    basis = jnp.asarray(basis, dtype=jnp.int32)
    status = jnp.asarray(status, dtype=jnp.int8)

    B_inv, xB = _recompute(A, basis, status, lb, ub)

    # Relative optimality tolerance: penalty objectives can be huge.
    tol = opt_tol * (1.0 + jnp.max(jnp.abs(c)))

    col_idx = jnp.arange(N, dtype=jnp.int32)
    row_idx = jnp.arange(m, dtype=jnp.int32)

    init = dict(
        B_inv=B_inv,
        xB=xB,
        basis=basis,
        status=status,
        gamma=jnp.ones((N,), dtype=dtype),  # Devex reference weights
        it=jnp.asarray(0, jnp.int32),
        stall=jnp.asarray(0, jnp.int32),
        state=jnp.asarray(-1, jnp.int32),  # -1 = running
    )

    def cond(s):
        return jnp.logical_and(s["state"] < 0, s["it"] < max_iterations)

    def body(s):
        B_inv, xB, basis, status = s["B_inv"], s["xB"], s["basis"], s["status"]

        # ---- pricing -------------------------------------------------
        y = (c[basis] @ B_inv)  # row duals
        r = c - y @ A  # reduced costs, O(mN)

        is_basic = status == BaseStat.BASIC
        free = status == BaseStat.ZERO
        # direction each nonbasic col would move to improve
        direction = jnp.where(status == BaseStat.UPPER, -1.0, 1.0)
        direction = jnp.where(free, -jnp.sign(r), direction)
        viol = jnp.where(is_basic, 0.0, direction * r)

        use_bland = s["stall"] > bland_after
        improving = viol < -tol
        # Devex: largest viol^2 / gamma (steepest-edge approximation);
        # Bland fallback: smallest improving index (anti-cycling).
        gamma = s["gamma"]
        score = jnp.where(improving, viol * viol / gamma, -1.0)
        q_devex = jnp.argmax(score)
        q_bland = jnp.min(jnp.where(improving, col_idx, N))
        q = jnp.where(use_bland, jnp.minimum(q_bland, N - 1), q_devex).astype(
            jnp.int32
        )
        optimal = ~jnp.any(improving)

        dir_q = direction[q]
        # ---- ratio test ----------------------------------------------
        w = B_inv @ A[:, q]
        delta = -dir_q * w  # rate of change of each basic value
        lbB = lb[basis]
        ubB = ub[basis]
        inf = jnp.asarray(jnp.inf, dtype=dtype)

        dec = delta < -piv_tol
        inc = delta > piv_tol
        t_dec = jnp.where(
            dec & _finite(lbB), (xB - lbB) / jnp.where(dec, -delta, 1.0), inf
        )
        t_inc = jnp.where(
            inc & _finite(ubB), (ubB - xB) / jnp.where(inc, delta, 1.0), inf
        )
        t_rows = jnp.maximum(jnp.where(dec, t_dec, t_inc), 0.0)
        t_rows = jnp.where(dec | inc, t_rows, inf)

        t_basic = jnp.min(t_rows)
        # Distance the entering column can travel before hitting its own
        # opposite bound, measured from its rest value (handles ZERO
        # columns resting at 0 between finite bounds).
        q_rest_val = jnp.where(
            status[q] == BaseStat.UPPER,
            jnp.where(_finite(ub[q]), ub[q], 0.0),
            jnp.where(
                (status[q] == BaseStat.LOWER) & _finite(lb[q]), lb[q], 0.0
            ),
        )
        t_flip_raw = jnp.where(dir_q > 0.0, ub[q] - q_rest_val, q_rest_val - lb[q])
        flip_bound_finite = jnp.where(dir_q > 0.0, _finite(ub[q]), _finite(lb[q]))
        t_flip = jnp.where(flip_bound_finite, jnp.maximum(t_flip_raw, 0.0), inf)

        t = jnp.minimum(t_basic, t_flip)
        unbounded = ~(t < inf)

        # Leaving row: among near-minimal ratios pick the largest |w| for
        # stability (Harris-flavored); Bland mode picks the smallest
        # basic column index instead.
        near = t_rows <= t_basic * (1.0 + 1e-9) + 1e-30
        stab_score = jnp.where(near, jnp.abs(w), -1.0)
        r_stab = jnp.argmax(stab_score)
        r_bland = jnp.argmin(jnp.where(near, basis, N + 1))
        row_r = jnp.where(use_bland, r_bland, r_stab).astype(jnp.int32)

        do_flip = t_flip <= t_basic

        # ---- apply the step ------------------------------------------
        t_safe = jnp.where(unbounded, 0.0, t)
        xB_moved = xB - t_safe * dir_q * w

        # (a) bound flip: q moves to the bound in its travel direction,
        # basis unchanged (also moves ZERO columns onto a bound)
        status_flip = status.at[q].set(
            jnp.where(dir_q > 0.0, BaseStat.UPPER, BaseStat.LOWER).astype(
                jnp.int8
            )
        )

        # (b) pivot: q enters, basis[row_r] leaves
        leaving = basis[row_r]
        leave_stat = jnp.where(
            delta[row_r] < 0.0, BaseStat.LOWER, BaseStat.UPPER
        ).astype(jnp.int8)
        status_piv = status.at[leaving].set(leave_stat)
        status_piv = status_piv.at[q].set(jnp.int8(BaseStat.BASIC))
        basis_piv = basis.at[row_r].set(q)

        # entering value after moving t from its resting point
        xB_piv = xB_moved.at[row_r].set(q_rest_val + dir_q * t_safe)

        # eta update of B_inv
        w_r = w[row_r]
        safe_wr = jnp.where(jnp.abs(w_r) > piv_tol, w_r, 1.0)
        pivot_row = B_inv[row_r] / safe_wr
        B_inv_piv = B_inv - jnp.outer(w, pivot_row)
        B_inv_piv = B_inv_piv.at[row_r].set(pivot_row)

        flip = do_flip & ~unbounded & ~optimal
        piv = ~do_flip & ~unbounded & ~optimal

        # Devex weight update (Forrest-Goldfarb):
        #   alpha_j = (B^-1 a_j)_r computed from row r of B^-1,
        #   gamma_j <- max(gamma_j, (alpha_j/alpha_q)^2 gamma_q),
        #   leaving column: gamma_l <- max(gamma_q / alpha_q^2, 1)
        alphas = B_inv[row_r] @ A  # O(mN), same cost as pricing
        alpha_q = jnp.where(jnp.abs(w_r) > piv_tol, w_r, 1.0)
        gamma_q = gamma[q]
        ratio_sq = (alphas / alpha_q) ** 2
        gamma_piv = jnp.maximum(gamma, ratio_sq * gamma_q)
        gamma_piv = gamma_piv.at[leaving].set(
            jnp.maximum(gamma_q / (alpha_q * alpha_q), 1.0)
        )
        gamma_piv = gamma_piv.at[q].set(1.0)  # now basic; reset on leave
        gamma_next = jnp.where(piv, gamma_piv, gamma)

        status_next = jnp.where(flip, status_flip, jnp.where(piv, status_piv, status))
        basis_next = jnp.where(piv, basis_piv, basis)
        B_inv_next = jnp.where(piv, B_inv_piv, B_inv)
        xB_next = jnp.where(
            flip, xB_moved, jnp.where(piv, xB_piv, xB)
        )

        # ---- periodic refactorization --------------------------------
        it_next = s["it"] + 1
        do_refac = piv & (it_next % refactor_every == 0)

        def refac(_):
            return _recompute(A, basis_next, status_next, lb, ub)

        B_inv_next, xB_next = lax.cond(
            do_refac, refac, lambda _: (B_inv_next, xB_next), operand=None
        )

        degenerate = t_safe <= degen_tol
        stall_next = jnp.where(
            optimal | unbounded,
            s["stall"],
            jnp.where(degenerate, s["stall"] + 1, 0),
        )

        state_next = jnp.where(
            optimal,
            OPTIMAL,
            jnp.where(unbounded, UNBOUNDED, s["state"]),
        ).astype(jnp.int32)

        return dict(
            B_inv=B_inv_next,
            xB=xB_next,
            basis=basis_next,
            status=status_next,
            gamma=gamma_next,
            it=jnp.where(optimal | unbounded, s["it"], it_next),
            stall=stall_next,
            state=state_next,
        )

    final = lax.while_loop(cond, body, init)

    basis = final["basis"]
    status = final["status"]
    B_inv, xB = final["B_inv"], final["xB"]

    x = _nonbasic_value(status, lb, ub)
    x = x.at[basis].set(xB)
    y = c[basis] @ B_inv
    r = c - y @ A
    state = jnp.where(final["state"] < 0, ITERATION_LIMIT, final["state"])

    # 1-norm condition estimate of the basis (reference lpi vtable
    # basis-condition op, lp/lpi_types.h:100-118)
    B = A[:, basis]
    condition = jnp.sum(jnp.abs(B), axis=0).max() * jnp.sum(
        jnp.abs(B_inv), axis=0
    ).max()

    return SimplexResult(
        x=x,
        duals=y,
        reduced_costs=r,
        status=status,
        basis=basis,
        obj=jnp.vdot(c, x),
        state=state,
        iterations=final["it"],
        condition=condition,
    )


def refine_result(
    A: Array, c: Array, lb: Array, ub: Array, res: SimplexResult
) -> SimplexResult:
    """Recompute all numeric quantities of ``res`` in the dtype of ``A``.

    The mixed-precision LP path runs the pivoting loops in float32 (the
    basis/status outcome is combinatorial) and calls this once with the
    float64 LP data: one QR factorization of the final basis reproduces
    primal values, duals, and reduced costs at full precision — the same
    refactor-on-exit a production LP code performs.

    A basis that is singular at full precision yields inf/nan from the
    QR solve; those results are zeroed and the state demoted to
    ITERATION_LIMIT so the caller neither extracts a poisoned working
    set nor saves the basis for warm starts.
    """
    basis = res.basis
    status = res.status
    B = A[:, basis]
    m = A.shape[0]
    B_inv = qr_solve(B, jnp.eye(m, dtype=A.dtype))
    xN = _nonbasic_value(status, lb, ub)
    xB = -B_inv @ (A @ xN)
    x = xN.at[basis].set(xB)
    y = c[basis] @ B_inv
    r = c - y @ A
    condition = jnp.sum(jnp.abs(B), axis=0).max() * jnp.sum(
        jnp.abs(B_inv), axis=0
    ).max()
    finite = (
        jnp.all(jnp.isfinite(x))
        & jnp.all(jnp.isfinite(y))
        & jnp.all(jnp.isfinite(r))
    )
    return SimplexResult(
        x=jnp.where(finite, x, 0.0),
        duals=jnp.where(finite, y, 0.0),
        reduced_costs=jnp.where(finite, r, 0.0),
        status=status,
        basis=basis,
        obj=jnp.where(finite, jnp.vdot(c, x), 0.0),
        state=jnp.where(finite, res.state, ITERATION_LIMIT).astype(jnp.int32),
        iterations=res.iterations,
        condition=jnp.where(finite, condition, jnp.inf),
    )


def polish_full_precision(
    A: Array,
    c: Array,
    lb: Array,
    ub: Array,
    res: SimplexResult,
    max_iterations: int,
) -> SimplexResult:
    """Precision escalation after a low-precision solve.

    The LP analogue of iterative refinement (what SoPlex does when asked
    for tighter-than-double accuracy): take the basis selected by the
    float32 pivoting loops and finish the solve in the full-precision
    dtype of ``A`` — a dual-simplex stage restores exact primal
    feasibility of the basis, then a primal pass repairs any basis
    decisions that fell inside the float32 tolerances (near convergence
    the Cauchy LP's reduced costs shrink to the stationarity-residual
    scale ~1e-6, *below* what float32 pricing against O(penalty) data
    can resolve — the escalation recovers them with a handful of exact
    pivots).  When the low-precision basis is already optimal at full
    precision both stages exit after a single bound/pricing check.

    Falls back to :func:`refine_result` when the dual stage cannot
    restore feasibility (singular or badly mangled basis).
    """
    dres = solve_dual(
        A, c, lb, ub, res.basis, res.status, max_iterations=max_iterations
    )

    def finish(_):
        out = solve(
            A,
            c,
            lb,
            ub,
            dres.basis,
            dres.status,
            max_iterations=max_iterations,
        )
        return out

    def fallback(_):
        out = refine_result(A, c, lb, ub, res)
        # align the iteration counter pytree with the finish branch
        return out._replace(iterations=jnp.asarray(0, jnp.int32))

    out = lax.cond(dres.state == OPTIMAL, finish, fallback, None)
    return out._replace(
        iterations=res.iterations + dres.iterations + out.iterations
    )




def write_lp(A, lb, ub, c, path, name="cauchy_lp") -> None:
    """Dump the LP ``min c^T x  s.t.  A x = 0, lb <= x <= ub`` in CPLEX
    LP text format (reference: the lpi ``write`` op, lpi_types.h:100-118
    — backend-native dumps used for offline debugging).  Host-side
    utility; call outside jit."""
    import numpy as np

    from ..types import INF_THRESHOLD

    A = np.asarray(A)
    lb = np.asarray(lb)
    ub = np.asarray(ub)
    c = np.asarray(c)
    m, N = A.shape

    def var(j):
        return f"x{j}"

    lines = [f"\\ {name}: {N} columns, {m} rows", "Minimize", " obj:"]
    terms = [
        f" {'+' if cj >= 0 else '-'} {abs(cj):.17g} {var(j)}"
        for j, cj in enumerate(c)
        if cj != 0.0
    ]
    lines[-1] += "".join(terms) if terms else " 0 x0"
    lines.append("Subject To")
    for i in range(m):
        row = "".join(
            f" {'+' if a >= 0 else '-'} {abs(a):.17g} {var(j)}"
            for j, a in enumerate(A[i])
            if a != 0.0
        )
        lines.append(f" r{i}:{row if row else ' 0 x0'} = 0")
    lines.append("Bounds")
    for j in range(N):
        lo = "-inf" if lb[j] < -INF_THRESHOLD else f"{lb[j]:.17g}"
        hi = "+inf" if ub[j] > INF_THRESHOLD else f"{ub[j]:.17g}"
        lines.append(f" {lo} <= {var(j)} <= {hi}")
    lines.append("End")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
