"""Presolve: fixed-variable elimination and linear-constraint reductions.

TPU-native equivalent of src/main/preprocessor/ (preprocessor.c,
fixed_var_func.c, transform.c, restore.c, preprocessing_state.c):

* **fixed variables** (lb == ub) are substituted out; the reduced function
  closes over the fixed values (fixed_var_func.c wraps the func to a
  reduced variable space)
* **singleton linear rows** (one nonzero coefficient) convert to variable
  bounds (preprocessor.c:19-60)
* **redundant linear rows** whose implied activity range is contained in
  the row bounds are dropped; rows whose implied range is disjoint from
  the bounds prove infeasibility (result enum incl. INFEASIBLE,
  pub_types.h:176-181)
* **restore** maps the reduced solution, duals, and working set back to
  the original space, reconstructing fixed-variable duals from
  stationarity (restore.c)

Because shapes are static under jit, all reductions happen at problem
*construction* time in Python — the reduced problem is just another
fixed-shape Problem.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .iterate import Iterate
from .problem import Func, Problem
from .types import ActiveState

Array = jax.Array


class PreprocessingResult(enum.IntEnum):
    SUCCESS = 0
    INFEASIBLE = 1


@dataclasses.dataclass
class ForcingConstraint:
    """A linear row whose bound can only be met with every variable at a
    box bound (preprocessor.c:395-431): the row is removed and its
    variables fixed.  ``at_lower`` means the row's *lower* bound forces
    the maximal activity (linear_max == linear_lb)."""

    row: int
    at_lower: bool
    variables: np.ndarray  # original variable indices with nonzero coeff
    factors: np.ndarray  # the nonzero coefficients


@dataclasses.dataclass
class ConvertedBound:
    """A singleton linear row converted into a variable bound
    (preprocessor.c:110-174); used to re-attribute an active bound dual
    to the original constraint on restore (restore.c:506-570)."""

    row: int
    variable: int
    factor: float
    tight_lower: bool  # the converted bound supplied the variable's lb
    tight_upper: bool  # ... the variable's ub


@dataclasses.dataclass
class Preprocessed:
    """Reduced problem + everything needed to restore solutions."""

    result: PreprocessingResult
    problem: Optional[Problem]  # reduced problem (None if infeasible)
    original: Problem
    free_vars: np.ndarray  # indices of kept variables
    fixed_vars: np.ndarray  # indices of eliminated variables
    fixed_values: np.ndarray
    kept_general: np.ndarray  # general cons indices kept (always all)
    kept_linear: np.ndarray  # linear row indices kept
    removed_linear: np.ndarray  # linear rows removed (singleton/redundant)
    forcing: list = dataclasses.field(default_factory=list)
    converted_bounds: list = dataclasses.field(default_factory=list)

    def reduce_point(self, x) -> Array:
        return jnp.asarray(x)[jnp.asarray(self.free_vars)]

    def restore_iterate(self, it: Iterate) -> Iterate:
        """Map a reduced-space iterate back to the original problem."""
        orig = self.original
        n = orig.num_variables
        dtype = orig.dtype

        x = jnp.zeros((n,), dtype=dtype)
        x = x.at[jnp.asarray(self.free_vars)].set(it.x)
        if len(self.fixed_vars):
            x = x.at[jnp.asarray(self.fixed_vars)].set(
                jnp.asarray(self.fixed_values, dtype=dtype)
            )

        obj_val, obj_grad, cons_val, cons_jac = orig.eval_all(x)

        m = orig.num_cons
        mg = orig.num_general
        cons_dual = jnp.zeros((m,), dtype=dtype)
        cons_states = jnp.zeros((m,), dtype=jnp.int8)
        kept = np.concatenate(
            [self.kept_general, mg + self.kept_linear]
        ).astype(np.int32)
        red_mg = len(self.kept_general)
        cons_dual = cons_dual.at[jnp.asarray(kept)].set(it.cons_dual)
        cons_states = cons_states.at[jnp.asarray(kept)].set(it.cons_states)

        vars_dual_np = np.zeros((n,))
        var_states_np = np.zeros((n,), dtype=np.int8)
        vars_dual_np[self.free_vars] = np.asarray(it.vars_dual)
        var_states_np[self.free_vars] = np.asarray(it.var_states)
        cons_dual_np = np.asarray(cons_dual).copy()
        cons_states_np = np.asarray(cons_states).copy()

        # stationarity residuals at eliminated variables (restore.c)
        resid = np.asarray(obj_grad + cons_jac.T @ cons_dual)
        claimed = np.zeros((n,), dtype=bool)
        claimed[self.free_vars] = True

        # -- forcing constraints (restore.c:384-502): attribute the
        # stationarity residual of the forced variables to the forcing
        # row's dual when any bound dual would otherwise have the wrong
        # sign; the absorbing variable stays inactive -------------------
        for fc in self.forcing:
            vs = [int(j) for j in fc.variables if not claimed[int(j)]]
            if not vs:
                continue
            factors = {
                int(j): float(a)
                for j, a in zip(fc.variables, fc.factors)
            }
            # desired state: at_lower row held at max activity => pos
            # coeff at upper bound (desired_var_state_in_forcing_...)
            def at_upper(j):
                return (factors[j] > 0) == fc.at_lower

            wrong = [
                j
                for j in vs
                if at_upper(j) != (-resid[j] >= 0.0)
            ]
            if wrong:
                ratios = {j: -resid[j] / factors[j] for j in wrong}
                max_j = max(ratios, key=lambda j: abs(ratios[j]))
                lam = ratios[max_j]
                row = mg + int(fc.row)
                cons_dual_np[row] = lam
                cons_states_np[row] = (
                    ActiveState.ACTIVE_LOWER
                    if fc.at_lower
                    else ActiveState.ACTIVE_UPPER
                )
                for j in vs:
                    claimed[j] = True
                    if j == max_j:
                        continue  # residual fully absorbed by the row
                    var_states_np[j] = (
                        ActiveState.ACTIVE_UPPER
                        if at_upper(j)
                        else ActiveState.ACTIVE_LOWER
                    )
                    vars_dual_np[j] = -(resid[j] + factors[j] * lam)
            else:
                for j in vs:
                    claimed[j] = True
                    var_states_np[j] = (
                        ActiveState.ACTIVE_UPPER
                        if at_upper(j)
                        else ActiveState.ACTIVE_LOWER
                    )
                    vars_dual_np[j] = -resid[j]

        # -- remaining fixed variables: nu = -(grad + J^T mu) -----------
        for j in self.fixed_vars:
            j = int(j)
            if claimed[j]:
                continue
            vars_dual_np[j] = -resid[j]
            var_states_np[j] = ActiveState.ACTIVE_BOTH

        # -- converted singleton bounds (restore.c:506-570): an active
        # variable bound that came from a singleton row re-attributes its
        # dual to the original constraint -------------------------------
        for cb in self.converted_bounds:
            j, row = int(cb.variable), mg + int(cb.row)
            state = int(var_states_np[j])
            if state == ActiveState.ACTIVE_BOTH:
                state = (
                    ActiveState.ACTIVE_UPPER
                    if vars_dual_np[j] >= 0
                    else ActiveState.ACTIVE_LOWER
                )
            from_row = (
                state == ActiveState.ACTIVE_LOWER and cb.tight_lower
            ) or (state == ActiveState.ACTIVE_UPPER and cb.tight_upper)
            if state == ActiveState.INACTIVE or not from_row:
                continue
            # bound flip: negative factor swaps lower/upper on the row
            at_upper = state == ActiveState.ACTIVE_UPPER
            if cb.factor < 0:
                at_upper = not at_upper
            cons_dual_np[row] = vars_dual_np[j] / cb.factor
            cons_states_np[row] = (
                ActiveState.ACTIVE_UPPER
                if at_upper
                else ActiveState.ACTIVE_LOWER
            )
            vars_dual_np[j] = 0.0
            var_states_np[j] = ActiveState.INACTIVE

        return Iterate(
            x=x,
            obj_val=obj_val,
            obj_grad=obj_grad,
            cons_val=cons_val,
            cons_jac=cons_jac,
            cons_dual=jnp.asarray(cons_dual_np, dtype=dtype),
            vars_dual=jnp.asarray(vars_dual_np, dtype=dtype),
            var_states=jnp.asarray(var_states_np),
            cons_states=jnp.asarray(cons_states_np),
        )


def preprocess(problem: Problem, feas_tol: float = 1e-9) -> Preprocessed:
    """Run presolve on a problem (reference: sleqp_preprocessor_create)."""
    n = problem.num_variables
    mg = problem.num_general
    ml = problem.num_linear

    var_lb = np.asarray(problem.data.var_lb, dtype=np.float64).copy()
    var_ub = np.asarray(problem.data.var_ub, dtype=np.float64).copy()
    lin_lb = np.asarray(problem.data.cons_lb[mg:], dtype=np.float64).copy()
    lin_ub = np.asarray(problem.data.cons_ub[mg:], dtype=np.float64).copy()
    A = np.asarray(problem.data.linear_coeffs, dtype=np.float64)

    if np.any(var_lb > var_ub + feas_tol):
        return _infeasible(problem)

    removed_rows: list[int] = []
    converted_bounds: list[ConvertedBound] = []
    forcing: list[ForcingConstraint] = []

    # -- singleton rows -> variable bounds (preprocessor.c:110-174) -----
    for i in range(ml):
        nz = np.nonzero(A[i])[0]
        if len(nz) == 1:
            j = int(nz[0])
            a = A[i, j]
            lo, hi = lin_lb[i], lin_ub[i]
            if a < 0:
                lo, hi = hi, lo
            lo = lo / a if np.isfinite(lo) else -np.inf
            hi = hi / a if np.isfinite(hi) else np.inf
            tight_lower = lo > var_lb[j]
            tight_upper = hi < var_ub[j]
            var_lb[j] = max(var_lb[j], lo)
            var_ub[j] = min(var_ub[j], hi)
            removed_rows.append(i)
            if tight_lower or tight_upper:
                converted_bounds.append(
                    ConvertedBound(i, j, float(a), tight_lower, tight_upper)
                )
        elif len(nz) == 0:
            # empty row: either trivially satisfied or infeasible
            if lin_lb[i] > feas_tol or lin_ub[i] < -feas_tol:
                return _infeasible(problem)
            removed_rows.append(i)

    if np.any(var_lb > var_ub + feas_tol):
        return _infeasible(problem)

    def _activity_bounds(i):
        lo = np.sum(np.where(A[i] >= 0, A[i] * var_lb, A[i] * var_ub))
        hi = np.sum(np.where(A[i] >= 0, A[i] * var_ub, A[i] * var_lb))
        return lo, hi

    # -- forcing constraints (preprocessor.c:372-431): a row whose bound
    # slack against the implied activity range is exactly zero can only
    # be satisfied with every participating variable at a box bound ----
    for i in range(ml):
        if i in removed_rows:
            continue
        lo_act, hi_act = _activity_bounds(i)
        if np.isfinite(lin_lb[i]):
            slack = hi_act - lin_lb[i]
            if slack < -feas_tol:
                return _infeasible(problem)
            if slack <= feas_tol:
                nz = np.nonzero(A[i])[0]
                # max activity: positive coeff at ub, negative at lb
                fixed = np.where(A[i, nz] > 0, var_ub[nz], var_lb[nz])
                var_lb[nz] = var_ub[nz] = fixed
                forcing.append(
                    ForcingConstraint(i, True, nz.astype(np.int32), A[i, nz])
                )
                removed_rows.append(i)
                continue
        if np.isfinite(lin_ub[i]):
            slack = lin_ub[i] - lo_act
            if slack < -feas_tol:
                return _infeasible(problem)
            if slack <= feas_tol:
                nz = np.nonzero(A[i])[0]
                # min activity: positive coeff at lb, negative at ub
                fixed = np.where(A[i, nz] > 0, var_lb[nz], var_ub[nz])
                var_lb[nz] = var_ub[nz] = fixed
                forcing.append(
                    ForcingConstraint(i, False, nz.astype(np.int32), A[i, nz])
                )
                removed_rows.append(i)

    # -- redundant / infeasible rows via implied activity bounds --------
    for i in range(ml):
        if i in removed_rows:
            continue
        lo_act, hi_act = _activity_bounds(i)
        if lo_act > lin_ub[i] + feas_tol or hi_act < lin_lb[i] - feas_tol:
            return _infeasible(problem)
        if (
            np.isfinite(lo_act)
            and np.isfinite(hi_act)
            and lo_act >= lin_lb[i] - feas_tol
            and hi_act <= lin_ub[i] + feas_tol
        ):
            removed_rows.append(i)  # redundant

    # -- implied variable bounds (preprocessor.c:176-258): tighten
    # var_min/var_max from each row's bound minus the remaining rows'
    # extreme activity; an empty implied interval proves infeasibility --
    var_min = var_lb.copy()
    var_max = var_ub.copy()
    for i in range(ml):
        if i in removed_rows:
            continue
        lo_act, hi_act = _activity_bounds(i)
        for j in np.nonzero(A[i])[0]:
            a = A[i, j]
            if (
                np.isfinite(lin_ub[i])
                and np.isfinite(lo_act)
                and np.isfinite(var_lb[j] if a > 0 else var_ub[j])
            ):
                if a > 0:
                    bound = (lin_ub[i] - lo_act) / a + var_lb[j]
                    var_max[j] = min(var_max[j], bound)
                else:
                    bound = (lin_ub[i] - lo_act) / a + var_ub[j]
                    var_min[j] = max(var_min[j], bound)
            if (
                np.isfinite(lin_lb[i])
                and np.isfinite(hi_act)
                and np.isfinite(var_ub[j] if a > 0 else var_lb[j])
            ):
                if a > 0:
                    bound = (lin_lb[i] - hi_act) / a + var_ub[j]
                    var_min[j] = max(var_min[j], bound)
                else:
                    bound = (lin_lb[i] - hi_act) / a + var_lb[j]
                    var_max[j] = min(var_max[j], bound)
    finite_pair = np.isfinite(var_min) & np.isfinite(var_max)
    gap = np.where(finite_pair, var_max - var_min, 0.0)
    scale = 1.0 + np.abs(np.where(finite_pair, var_min, 0.0))
    if np.any(gap < -feas_tol * scale):
        return _infeasible(problem)

    kept_linear = np.array(
        [i for i in range(ml) if i not in removed_rows], dtype=np.int32
    )
    removed_linear = np.array(sorted(removed_rows), dtype=np.int32)

    # -- fixed variables ------------------------------------------------
    both_finite = np.isfinite(var_lb) & np.isfinite(var_ub)
    fixed_mask = both_finite & (
        np.abs(np.where(both_finite, var_ub - var_lb, 1.0))
        <= feas_tol * (1.0 + np.abs(np.where(both_finite, var_lb, 0.0)))
    )
    fixed_vars = np.nonzero(fixed_mask)[0].astype(np.int32)
    free_vars = np.nonzero(~fixed_mask)[0].astype(np.int32)
    fixed_values = 0.5 * (var_lb[fixed_vars] + var_ub[fixed_vars])

    orig_func = problem.func
    nr = len(free_vars)
    free_idx = jnp.asarray(free_vars)
    fixed_idx = jnp.asarray(fixed_vars)
    fixed_vals = jnp.asarray(fixed_values)

    def expand(xr):
        x = jnp.zeros((n,), dtype=xr.dtype)
        x = x.at[free_idx].set(xr)
        if len(fixed_vars):
            x = x.at[fixed_idx].set(fixed_vals.astype(xr.dtype))
        return x

    # reduced function: evaluate the original func on the expanded point
    # (fixed_var_func.c semantics)
    red_func = Func(
        obj=lambda xr: orig_func.obj_val(expand(xr)),
        num_variables=nr,
        cons=(lambda xr: orig_func.cons_val(expand(xr))) if mg else None,
        num_cons=mg,
        hess_prod=(
            lambda xr, d, mu: orig_func.hess_prod(
                expand(xr), expand_dir(d), mu
            )[free_idx]
        ),
        psd_hessian=orig_func.psd_hessian,
    )

    def expand_dir(dr):
        d = jnp.zeros((n,), dtype=dr.dtype)
        return d.at[free_idx].set(dr)

    lin_kept = A[kept_linear][:, free_vars] if len(kept_linear) else None
    lin_kept_lb = lin_lb[kept_linear] if len(kept_linear) else None
    lin_kept_ub = lin_ub[kept_linear] if len(kept_linear) else None
    # shift linear bounds by the fixed-variable contribution
    if len(kept_linear) and len(fixed_vars):
        shift = A[kept_linear][:, fixed_vars] @ fixed_values
        lin_kept_lb = lin_kept_lb - shift
        lin_kept_ub = lin_kept_ub - shift

    reduced = Problem(
        red_func,
        var_lb=jnp.asarray(var_lb[free_vars]),
        var_ub=jnp.asarray(var_ub[free_vars]),
        general_lb=problem.data.cons_lb[:mg],
        general_ub=problem.data.cons_ub[:mg],
        linear_coeffs=lin_kept,
        linear_lb=lin_kept_lb,
        linear_ub=lin_kept_ub,
        dtype=problem.dtype,
    )

    return Preprocessed(
        result=PreprocessingResult.SUCCESS,
        problem=reduced,
        original=problem,
        free_vars=free_vars,
        fixed_vars=fixed_vars,
        fixed_values=fixed_values,
        kept_general=np.arange(mg, dtype=np.int32),
        kept_linear=kept_linear,
        removed_linear=removed_linear,
        forcing=forcing,
        converted_bounds=converted_bounds,
    )


def _infeasible(problem: Problem) -> Preprocessed:
    return Preprocessed(
        result=PreprocessingResult.INFEASIBLE,
        problem=None,
        original=problem,
        free_vars=np.arange(problem.num_variables, dtype=np.int32),
        fixed_vars=np.zeros(0, dtype=np.int32),
        fixed_values=np.zeros(0),
        kept_general=np.arange(problem.num_general, dtype=np.int32),
        kept_linear=np.zeros(0, dtype=np.int32),
        removed_linear=np.zeros(0, dtype=np.int32),
    )
