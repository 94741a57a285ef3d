"""First-order LP solver (restarted average PDHG, à la PDLP).

The scalable fallback for huge Cauchy LPs (SURVEY.md §7.3: "first-order/
PDLP fallback mode for huge instances").  The revised simplex
(ops/simplex.py) pays O(m N) per *pivot* with an inherently sequential
pivot chain; primal-dual hybrid gradient pays O(m N) per *iteration* of
pure matvecs — fully MXU-friendly, batched, and with no sequential basis
updates — at the price of lower accuracy per iteration.  The crossover
rule of thumb: prefer the simplex while the expected pivot count is
small (warm-started SQP iterations), PDHG when N is large or many LPs
batch together.

Problem form (matches ops/simplex.py):

    min c^T x   s.t.  A x = 0,   lb <= x <= ub

with +-1e20 as infinity (types.INF).  Saddle-point form
``min_x max_y  c^T x + y^T A x`` over the box; PDHG alternates

    x_{k+1} = proj_box(x_k - tau (c + A^T y_k))
    y_{k+1} = y_k + sigma A (2 x_{k+1} - x_k)

with tau sigma ||A||_2^2 <= 1 (||A|| estimated by power iteration),
plus the three accelerators that make PDHG practical on LPs (Applegate
et al., "Practical large-scale linear programming using primal-dual
hybrid gradient", NeurIPS 2021; public algorithm, no code consulted):
Ruiz equilibration, adaptive restart-to-average on sufficient KKT-error
decay, and an adaptive primal weight balancing the primal/dual step
sizes from observed movement ratios.

Returns approximate basis *statuses* synthesized from bound proximity
and reduced-cost signs so the Cauchy layer can extract a working set;
there is no simplex basis (callers keep their saved bases untouched).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import INF_THRESHOLD, BaseStat

Array = jax.Array

OPTIMAL = 0
ITERATION_LIMIT = 1


class PDLPResult(NamedTuple):
    x: Array  # (N,) primal solution
    duals: Array  # (m,) row duals y (sign convention of simplex.solve)
    reduced_costs: Array  # (N,) c - A^T y
    status: Array  # (N,) int8 synthesized BaseStat per column
    obj: Array
    state: Array  # int32 OPTIMAL / ITERATION_LIMIT
    iterations: Array  # int32 PDHG iterations
    primal_res: Array  # ||A x||_inf
    dual_res: Array  # ||proj of reduced costs||_inf


class DenseOp:
    """Operator view of a dense constraint matrix.

    PDHG touches A only through matvecs and |A| row/col maxima, so the
    solver runs equally on any implicit operator exposing this protocol
    — e.g. a banded Jacobian stored as diagonals (banded.py) whose dense
    form would not fit on chip.
    """

    def __init__(self, A: Array):
        self.A = A
        self.shape = A.shape
        self.dtype = A.dtype

    def mv(self, x: Array) -> Array:  # A @ x
        return self.A @ x

    def rmv(self, y: Array) -> Array:  # A^T y
        return y @ self.A

    def scaled_row_max(self, d_c: Array) -> Array:  # max_j |A_ij| d_c[j]
        return jnp.max(jnp.abs(self.A) * d_c[None, :], axis=1)

    def scaled_col_max(self, d_r: Array) -> Array:  # max_i |A_ij| d_r[i]
        return jnp.max(jnp.abs(self.A) * d_r[:, None], axis=0)


def _as_op(A):
    return A if hasattr(A, "mv") else DenseOp(A)


def _ruiz_equilibrate(op, iters: int = 10):
    """Ruiz row/column inf-norm equilibration: returns (d_r, d_c) with
    D_r A D_c well-scaled.  Standard LP preconditioning (used by PDLP);
    dramatically improves PDHG convergence on penalty-LP geometry."""
    m, N = op.shape
    d_r = jnp.ones((m,), op.dtype)
    d_c = jnp.ones((N,), op.dtype)

    def body(_, carry):
        d_r, d_c = carry
        row = jnp.sqrt(
            jnp.maximum(d_r * op.scaled_row_max(d_c), 1e-30)
        )
        col = jnp.sqrt(
            jnp.maximum(d_c * op.scaled_col_max(d_r), 1e-30)
        )
        return d_r / row, d_c / col

    d_r, d_c = lax.fori_loop(0, iters, body, (d_r, d_c))
    return d_r, d_c


def _norm_estimate(op, d_r, d_c, iters: int = 30) -> Array:
    """Power iteration for ||D_r A D_c||_2 (deterministic start)."""
    m, N = op.shape
    v = jnp.full((N,), 1.0 / jnp.sqrt(N), dtype=op.dtype)

    def body(_, v):
        w = d_r * op.mv(d_c * v)
        u = d_c * op.rmv(d_r * w)
        return u / jnp.maximum(jnp.linalg.norm(u), 1e-30)

    v = lax.fori_loop(0, iters, body, v)
    return jnp.linalg.norm(d_r * op.mv(d_c * v)) + 1e-12


def _proj(x: Array, lb: Array, ub: Array) -> Array:
    return jnp.clip(x, lb, ub)


def _kkt_residuals(op, c, lb, ub, x, y):
    """PDLP-style termination measures for the box LP (simplex dual sign
    convention: reduced costs r = c - A^T y):

    * primal residual ||Ax||_inf,
    * dual infeasibility: components of r whose sign cannot be absorbed
      by a finite bound multiplier (lb multiplier needs r >= 0 supported
      on a finite lb, etc.),
    * duality gap |c^T x - (sum_j lb_j r_j^+ + ub_j r_j^-)| — the
      complementarity measure that is meaningful for non-vertex
      (first-order) iterates.
    """
    r = c - op.rmv(y)
    finite_lb = lb > -INF_THRESHOLD
    finite_ub = ub < INF_THRESHOLD
    r_pos = jnp.maximum(r, 0.0)
    r_neg = jnp.minimum(r, 0.0)
    dinf = jnp.where(finite_lb, 0.0, r_pos) - jnp.where(finite_ub, 0.0, r_neg)
    dres = jnp.max(dinf, initial=0.0)
    dual_obj = jnp.sum(
        jnp.where(finite_lb, lb, 0.0) * r_pos
        + jnp.where(finite_ub, ub, 0.0) * r_neg
    )
    pobj = jnp.vdot(c, x)
    gap = jnp.abs(pobj - dual_obj) / (1.0 + jnp.abs(pobj) + jnp.abs(dual_obj))
    pres = jnp.max(jnp.abs(op.mv(x)), initial=0.0)
    return pres, jnp.maximum(dres, gap)


def solve(
    A: Array,
    c: Array,
    lb: Array,
    ub: Array,
    x0: Array | None = None,
    y0: Array | None = None,
    max_iterations: int = 20000,
    tol: float = 1e-8,
    check_every: int = 64,
    adaptive_weight: bool = True,
) -> PDLPResult:
    """Restarted-average PDHG with Ruiz equilibration and adaptive
    primal weight, to KKT tolerance ``tol`` (scaled, measured in the
    ORIGINAL problem space).  ``A`` may be a dense (m, N) array or any
    operator with the DenseOp protocol (mv/rmv/scaled_row_max/
    scaled_col_max/shape/dtype) — the matrix itself is never formed."""
    op = _as_op(A)
    m, N = op.shape
    dtype = op.dtype
    # clamp infinities so the projection arithmetic stays finite
    big = jnp.asarray(1e18, dtype)
    lb = jnp.maximum(lb, -big)
    ub = jnp.minimum(ub, big)

    # ---- Ruiz scaling kept as vectors: Ab = Dr A Dc applied on the fly
    d_r, d_c = _ruiz_equilibrate(op)
    cb = c * d_c
    lbb = lb / d_c
    ubb = ub / d_c

    xb = _proj(
        jnp.zeros((N,), dtype) if x0 is None else x0 / d_c, lbb, ubb
    )
    yb = jnp.zeros((m,), dtype) if y0 is None else y0 / d_r

    Anorm = _norm_estimate(op, d_r, d_c)
    scale = 1.0 + jnp.max(jnp.abs(c))
    rtol = tol * scale

    inf = jnp.asarray(jnp.inf, dtype)
    init = dict(
        x=xb,
        y=yb,
        x_sum=jnp.zeros_like(xb),
        y_sum=jnp.zeros_like(yb),
        navg=jnp.asarray(0.0, dtype),
        x_anchor=xb,
        y_anchor=yb,
        omega=jnp.asarray(1.0, dtype),  # primal weight
        e_last=inf,  # KKT error at the last restart
        since=jnp.asarray(0, jnp.int32),  # iterations since last restart
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )

    def orig_residuals(xb, yb):
        """KKT residuals in the original space (simplex sign convention)."""
        x = d_c * xb
        y = d_r * yb
        return _kkt_residuals(op, c, lb, ub, x, -y)

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iterations)

    def body(s):
        x, y, omega = s["x"], s["y"], s["omega"]
        # primal weight omega tracks ||dy||/||dx||: tau = eta/omega,
        # sigma = eta*omega (tau*sigma*||A||^2 < 1 for any omega)
        tau = 0.9 / (omega * Anorm)
        sigma = 0.9 * omega / Anorm
        x_new = _proj(x - tau * (cb + d_c * op.rmv(d_r * y)), lbb, ubb)
        y_new = y + sigma * (d_r * op.mv(d_c * (2.0 * x_new - x)))

        x_sum = s["x_sum"] + x_new
        y_sum = s["y_sum"] + y_new
        navg = s["navg"] + 1.0
        it = s["it"] + 1
        since = s["since"] + 1

        # ---- candidate evaluation + adaptive restart ------------------
        # Restart to the better of {current, ergodic average} when the
        # KKT error decayed sufficiently since the last restart
        # (beta = 0.2) or the period grew too long — the adaptive scheme
        # that gives restarted PDHG its linear LP convergence.
        check_now = (it % check_every) == 0

        carry = (
            x_new, y_new, x_sum, y_sum, navg,
            s["x_anchor"], s["y_anchor"], omega, s["e_last"], since,
            jnp.asarray(False),
        )

        def check(carry):
            (x_new, y_new, x_sum, y_sum, navg,
             x_anchor, y_anchor, omega, e_last, since, _) = carry
            x_avg = _proj(x_sum / jnp.maximum(navg, 1.0), lbb, ubb)
            y_avg = y_sum / jnp.maximum(navg, 1.0)
            pc, dc_ = orig_residuals(x_new, y_new)
            pa, da = orig_residuals(x_avg, y_avg)
            e_cur = pc + dc_
            e_avg = pa + da
            take_avg = e_avg < e_cur
            xr = jnp.where(take_avg, x_avg, x_new)
            yr = jnp.where(take_avg, y_avg, y_new)
            e_best = jnp.minimum(e_avg, e_cur)
            done = jnp.where(
                take_avg, (pa <= rtol) & (da <= rtol), (pc <= rtol) & (dc_ <= rtol)
            )

            do_restart = done | (e_best <= 0.2 * e_last) | (since >= 4096)

            dx = jnp.linalg.norm(xr - x_anchor)
            dy = jnp.linalg.norm(yr - y_anchor)
            valid = (dx > 1e-12) & (dy > 1e-12)
            if adaptive_weight:
                omega_r = jnp.where(
                    valid,
                    jnp.exp(0.5 * jnp.log(dy / dx) + 0.5 * jnp.log(omega)),
                    omega,
                )
                omega_r = jnp.clip(omega_r, 1e-4, 1e4)
            else:
                omega_r = omega

            def on_restart(_):
                return (
                    xr, yr, jnp.zeros_like(x_sum), jnp.zeros_like(y_sum),
                    0.0 * navg, xr, yr, omega_r, e_best,
                    jnp.asarray(0, jnp.int32), done,
                )

            def keep(_):
                return (
                    x_new, y_new, x_sum, y_sum, navg,
                    x_anchor, y_anchor, omega, e_last, since, done,
                )

            return lax.cond(do_restart, on_restart, keep, None)

        (x_new, y_new, x_sum, y_sum, navg, x_anchor, y_anchor, omega,
         e_last, since, done) = lax.cond(
            check_now, check, lambda cr: cr, carry
        )

        return dict(
            x=x_new, y=y_new, x_sum=x_sum, y_sum=y_sum, navg=navg,
            x_anchor=x_anchor, y_anchor=y_anchor, omega=omega,
            e_last=e_last, since=since, it=it, done=done,
        )

    final = lax.while_loop(cond, body, init)
    x, y = d_c * final["x"], d_r * final["y"]
    # match the simplex dual sign convention: reduced costs r = c - y A
    # with y such that r >= 0 at lower bounds at optimality
    y_out = -y
    r = c - op.rmv(y_out)
    pres, dres = _kkt_residuals(op, c, lb, ub, x, y_out)

    # ---- synthesized basis statuses -----------------------------------
    eps = 1e-7
    finite_lb = lb > -INF_THRESHOLD
    finite_ub = ub < INF_THRESHOLD
    at_lb = finite_lb & (x <= lb + eps * (1.0 + jnp.abs(lb)))
    at_ub = finite_ub & (x >= ub - eps * (1.0 + jnp.abs(ub)))
    status = jnp.where(
        at_lb & (r > 0.0),
        BaseStat.LOWER,
        jnp.where(at_ub & (r < 0.0), BaseStat.UPPER, BaseStat.BASIC),
    ).astype(jnp.int8)

    state = jnp.where(
        (pres <= rtol) & (dres <= rtol), OPTIMAL, ITERATION_LIMIT
    ).astype(jnp.int32)
    return PDLPResult(
        x=x,
        duals=y_out,
        reduced_costs=r,
        status=status,
        obj=jnp.vdot(c, x),
        state=state,
        iterations=final["it"],
        primal_res=pres,
        dual_res=dres,
    )
