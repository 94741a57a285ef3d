"""The SQP iteration loop (problem solver).

TPU-native equivalent of src/main/problem_solver/{solve.c,iteration.c,
trust_radius.c,step.c} + the trial-point layer sequencing
(src/main/trial_point.c, trial_point/cauchy_step.c):

one `perform_iteration` = LP (Cauchy) step -> penalty update -> working set
+ LSQ duals -> optimality test -> working step -> Newton/EQP step via
projected CG -> Cauchy-Newton linesearch -> trial evaluation -> step rule
-> optional second-order correction -> trust-radius and penalty updates.

The whole iteration is a pure function `SolverState -> SolverState`; the
solve loop is `lax.while_loop(status == RUNNING, perform_iteration, s0)` and
therefore jit-compiles into a single XLA program (and vmaps across problem
instances with identical shapes).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .cauchy import (
    CauchyBasis,
    CauchyResult,
    _trim_duals,
    empty_basis,
    solve_box_cauchy,
    solve_cauchy_lp,
)
from .iterate import (
    Iterate,
    create_iterate,
    kkt_residuals,
    max_violation,
)
from .linesearch import (
    cauchy_linesearch,
    trial_linesearch,
    trial_linesearch_exact,
)
from .measure import compute_measure, empty_measure
from .merit import (
    Direction,
    make_direction,
    merit_func,
    merit_linear,
    merit_quadratic,
)
from .newton import compute_newton_step, compute_working_step, _working_set_rhs
from .ops.kkt import aug_jac_create, solve_lsq, solve_min_norm
from .penalty import global_penalty_reset, update_penalty
from .problem import Problem
from .quasi_newton import (
    QNPrev,
    QNState,
    qn_init,
    qn_prev_init,
    qn_product,
    qn_push,
)
from .settings import Settings
from .step_rule import StepRuleState, apply_step_rule, step_rule_init
from .types import HessEval, Status, StepType

Array = jax.Array

# problem_solver.c:10-11
PENALTY_DEFAULT = 10.0
TRUST_REGION_FACTOR = 0.8
# iteration.c:10-13
MAX_GLOBAL_RESETS = 2
NUM_RESET_STEPS = 5
SOC_SAFEGUARD_FACTOR = 10.0


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b
    )


def _aug_jac_method(settings: Settings) -> str:
    """Map the AUG_JAC_METHOD setting to a factorization route
    (trial_point.c:64-130 variant selection)."""
    from .types import AugJacMethod

    if settings.aug_jac_method == AugJacMethod.DIRECT:
        return "direct"
    return "reduced"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolverState:
    """Complete, fixed-shape solver state (one SQP instance)."""

    it: Iterate
    trust_radius: Array
    lp_trust_radius: Array
    penalty: Array
    basis: CauchyBasis
    iteration: Array  # int32
    status: Array  # int32 Status
    last_step_type: Array  # int32 StepType
    num_feasible_steps: Array
    num_global_resets: Array
    num_accepted: Array
    num_soc_accepted: Array
    num_rejected: Array
    num_failed_eqp: Array
    feas_res: Array
    slack_res: Array
    stat_res: Array
    min_rayleigh: Array
    max_rayleigh: Array
    lp_iterations: Array  # total simplex pivots
    boundary_step: Array  # bool
    qn: object  # QN ring buffer(s): QNState or per-Hessian-block tuple
    qn_prev: QNPrev  # previous-iterate data for the next pair push
    step_rule: StepRuleState  # nonmonotone step-rule state
    # dynamic (inexact) function state (dyn.py); inert otherwise
    error_bound: Array
    error_est: Array
    refresh_eval: Array  # bool: re-evaluate iterate at tightened bound
    # per-step nonlinearity measures (reference measure.c:15-40)
    last_model_reduction: Array
    last_exact_reduction: Array
    last_reduction_ratio: Array
    # full model-vs-actual obj/violation split (measure.c:152-295)
    measure: object  # Measure pytree
    # numerical-invariant violation bitmask (settings.num_asserts;
    # trial_point.c:620-708): 1 = direction bundle inconsistent,
    # 2 = model merit mismatch, 4 = non-finite solver quantity
    num_assert_fail: Array  # int32


def initial_state(problem: Problem, settings: Settings, x0: Array) -> SolverState:
    """Initial radii/penalty (problem_solver.c:83-118)."""
    from .types import InitialTRChoice

    it = create_iterate(problem, x0)
    n = problem.num_variables
    m = problem.num_cons
    dtype = problem.dtype
    sqrt_n = float(max(n, 1)) ** 0.5
    if settings.initial_tr_choice == InitialTRChoice.WIDE:
        # Knitro default (problem_solver.c:100-104)
        trust_radius = jnp.asarray(sqrt_n, dtype=dtype)
        lp_trust_radius = jnp.asarray(TRUST_REGION_FACTOR, dtype=dtype)
    else:
        # suggested in the original paper (problem_solver.c:94-99)
        trust_radius = jnp.asarray(1.0, dtype=dtype)
        lp_trust_radius = jnp.asarray(
            TRUST_REGION_FACTOR / sqrt_n, dtype=dtype
        )
    zero_i = jnp.asarray(0, jnp.int32)
    zero_f = jnp.asarray(0.0, dtype=dtype)
    return SolverState(
        it=it,
        trust_radius=trust_radius,
        lp_trust_radius=lp_trust_radius,
        penalty=jnp.asarray(PENALTY_DEFAULT, dtype=dtype),
        basis=empty_basis(n, m),
        iteration=zero_i,
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        last_step_type=jnp.asarray(StepType.NONE, jnp.int32),
        num_feasible_steps=zero_i,
        num_global_resets=zero_i,
        num_accepted=zero_i,
        num_soc_accepted=zero_i,
        num_rejected=zero_i,
        num_failed_eqp=zero_i,
        feas_res=jnp.asarray(jnp.inf, dtype=dtype),
        slack_res=jnp.asarray(jnp.inf, dtype=dtype),
        stat_res=jnp.asarray(jnp.inf, dtype=dtype),
        min_rayleigh=zero_f,
        max_rayleigh=zero_f,
        lp_iterations=zero_i,
        boundary_step=jnp.asarray(False),
        qn=qn_init(
            n,
            settings.num_quasi_newton_iterates
            if settings.hess_eval != HessEval.EXACT
            else 0,
            dtype,
            blocks=problem.func.hess_struct
            if settings.hess_eval != HessEval.EXACT
            else None,
        ),
        qn_prev=qn_prev_init(n, m, dtype),
        step_rule=step_rule_init(settings.step_rule, dtype),
        error_bound=jnp.asarray(
            getattr(problem.func, "initial_error_bound", 0.0), dtype=dtype
        ),
        error_est=jnp.asarray(0.0, dtype=dtype),
        refresh_eval=jnp.asarray(False),
        last_model_reduction=zero_f,
        last_exact_reduction=zero_f,
        last_reduction_ratio=zero_f,
        measure=empty_measure(dtype),
        num_assert_fail=zero_i,
    )


def _reduction_ratio(exact_reduction: Array, model_reduction: Array) -> Array:
    """util.c:245-261 sleqp_reduction_ratio."""
    eps = 10.0 * jnp.finfo(exact_reduction.dtype).eps
    ce = exact_reduction - eps
    cm = model_reduction - eps
    tiny = (jnp.abs(cm) <= eps) & (jnp.abs(ce) <= eps)
    return jnp.where(tiny, 1.0, ce / jnp.where(tiny, 1.0, cm))


def _update_trust_radius(
    trust_radius: Array,
    ratio: Array,
    accepted: Array,
    direction_norm: Array,
    eps: float,
) -> Array:
    """EQP radius update (trust_radius.c:47-84)."""
    grow7 = jnp.maximum(trust_radius, 7.0 * direction_norm)
    grow2 = jnp.maximum(trust_radius, 2.0 * direction_norm)
    tiny_step = jnp.abs(direction_norm) <= eps
    shrink = jnp.where(
        tiny_step,
        0.5 * trust_radius,
        jnp.minimum(0.5 * trust_radius, 0.5 * direction_norm),
    )
    return jnp.where(
        ratio >= 0.9,
        grow7,
        jnp.where(
            ratio >= 0.3,
            grow2,
            jnp.where(accepted, trust_radius, shrink),
        ),
    )


def _update_lp_trust_radius(
    lp_trust_radius: Array,
    accepted: Array,
    trial_step_infnorm: Array,
    cauchy_step_infnorm: Array,
    full_cauchy_step: Array,
) -> Array:
    """LP radius update (trust_radius.c:5-45)."""
    factor = 1.2
    lhs = jnp.maximum(
        jnp.maximum(factor * trial_step_infnorm, factor * cauchy_step_infnorm),
        0.1 * lp_trust_radius,
    )
    grown = jnp.where(full_cauchy_step, 7.0 * lp_trust_radius, lp_trust_radius)
    on_accept = jnp.minimum(lhs, grown)
    reduced = jnp.maximum(0.5 * trial_step_infnorm, 0.1 * lp_trust_radius)
    on_reject = jnp.minimum(reduced, lp_trust_radius)
    return jnp.where(accepted, on_accept, on_reject)


def perform_iteration(
    problem: Problem, settings: Settings, state: SolverState
) -> SolverState:
    """One SQP iteration (problem_solver/iteration.c:350-601)."""
    data = problem.data
    it = state.it
    n = problem.num_variables
    m = problem.num_cons
    dtype = problem.dtype
    # Mixed precision (static): inner sequential solvers run in float32,
    # certified quantities (residuals, duals, merit) stay in the state
    # dtype.  None = single-precision path disabled / already float32.
    cdtype = (
        jnp.float32
        if settings.compute_dtype == "float32"
        and jnp.dtype(dtype) != jnp.float32
        else None
    )

    # ---- dynamic functions: refresh the iterate at a tightened bound --
    from .dyn import DynFunc, required_error_bound

    is_dynamic = isinstance(problem.func, DynFunc)
    iterate_err = state.error_est
    if is_dynamic:

        def refresh(args):
            cur_it, _ = args
            obj, grad, cons, jac, err = problem.func.eval_all_dyn(
                cur_it.x, state.error_bound, state.penalty
            )
            new_it = dataclasses.replace(
                cur_it,
                obj_val=obj,
                obj_grad=grad,
                cons_val=cons,
                cons_jac=jac,
            )
            return new_it, err

        it, iterate_err = lax.cond(
            state.refresh_eval, refresh, lambda args: args, (it, iterate_err)
        )

    # ---- feasibility bookkeeping + global penalty reset ---------------
    feas_now = max_violation(data, it.cons_val)
    is_feasible = feas_now <= settings.feas_tol
    num_feasible_steps = jnp.where(
        is_feasible, state.num_feasible_steps + 1, 0
    )
    allow_reset = (
        settings.global_penalty_resets
        & (num_feasible_steps >= NUM_RESET_STEPS)
        & (state.num_global_resets < MAX_GLOBAL_RESETS)
    )
    penalty, did_reset = global_penalty_reset(
        it, state.penalty, allow_reset & is_feasible
    )
    num_global_resets = state.num_global_resets + did_reset.astype(jnp.int32)

    merit_val = merit_func(data, it, penalty)

    # ---- Cauchy LP step -----------------------------------------------
    if m > 0:
        from .cauchy import resolved_lp_solver

        lp_backend = resolved_lp_solver(settings, n, m)
        cres = solve_cauchy_lp(
            data,
            it,
            state.lp_trust_radius,
            penalty,
            state.basis,
            settings_eps=settings.eps,
            lp_resolves=settings.lp_resolves,
            dual_warm_start=settings.lp_dual_warm_start,
            lp_solver=lp_backend,
            pdlp_tol=settings.pdlp_tol,
            compute_dtype=cdtype,
        )

        # Byrd penalty update when infeasible (cauchy_step.c:80-88)
        def byrd(_):
            return update_penalty(
                data, it, state.lp_trust_radius, penalty, cres,
                lp_solver=lp_backend, pdlp_tol=settings.pdlp_tol,
                compute_dtype=cdtype,
            )

        def keep(_):
            return penalty, cres, jnp.asarray(False)

        penalty, cres, pen_changed = lax.cond(is_feasible, keep, byrd, None)
        merit_val = jnp.where(
            pen_changed, merit_func(data, it, penalty), merit_val
        )
    else:
        cres = solve_box_cauchy(data, it, state.lp_trust_radius)

    # ---- working set + duals onto the iterate -------------------------
    it = dataclasses.replace(
        it, var_states=cres.var_states, cons_states=cres.cons_states
    )
    aug_jac = aug_jac_create(
        it.cons_jac, it.var_states, it.cons_states, method=_aug_jac_method(settings)
    )
    # dual estimation (dual_estimation/*, selected by settings):
    #   LSQ (default): least-squares duals from the KKT factorization with
    #   wrong-sign clipping; LP: duals straight from the LP basis; MIXED:
    #   LSQ, falling back to LP per vector when clipping occurred
    #   (dual_estimation_mixed.c:105-135).
    from .types import DualEstimationType

    _, lam = solve_lsq(aug_jac, -it.obj_grad)
    vars_lsq = _trim_duals(lam[:n], it.var_states)
    cons_lsq = _trim_duals(lam[n:], it.cons_states)
    if settings.dual_estimation_type == DualEstimationType.LP:
        vars_dual, cons_dual = cres.vars_dual, cres.cons_dual
    elif settings.dual_estimation_type == DualEstimationType.MIXED:
        vars_clipped = jnp.any(vars_lsq != lam[:n])
        cons_clipped = jnp.any(cons_lsq != lam[n:])
        vars_dual = jnp.where(vars_clipped, cres.vars_dual, vars_lsq)
        cons_dual = jnp.where(cons_clipped, cres.cons_dual, cons_lsq)
    else:
        vars_dual, cons_dual = vars_lsq, cons_lsq
    it = dataclasses.replace(it, vars_dual=vars_dual, cons_dual=cons_dual)

    feas_res, slack_res, stat_res = kkt_residuals(data, it)
    optimal = (
        (feas_res <= settings.feas_tol)
        & (stat_res < settings.stat_tol)
        & (slack_res < settings.slack_tol)
    )
    unbounded = (it.obj_val <= settings.obj_lower) & (
        feas_res <= settings.feas_tol
    )
    locally_infeasible = cres.locally_infeasible & jnp.asarray(m > 0)
    deadpoint = (state.lp_trust_radius <= settings.deadpoint_bound) | (
        state.trust_radius <= settings.deadpoint_bound
    )

    # ---- quasi-Newton pair push (accepted steps, new duals) -----------
    # Reference: solver.c wraps the func so hess_prod is served by the QN
    # approximation; pairs push on accepted steps with the Lagrangian
    # gradient difference at the new multipliers (quasi_newton.c:140).
    qn = state.qn
    qn_blocks = problem.func.hess_struct
    if settings.hess_eval != HessEval.EXACT:

        def push(q):
            prev = state.qn_prev
            s_vec = it.x - prev.x
            grad_new = it.obj_grad + it.cons_jac.T @ it.cons_dual
            grad_old = prev.grad + prev.jac.T @ it.cons_dual
            return qn_push(
                q,
                s_vec,
                grad_new - grad_old,
                settings.hess_eval,
                settings.bfgs_sizing != 0,
                blocks=qn_blocks,
            )

        qn = lax.cond(state.qn_prev.pending, push, lambda q: q, qn)

    # ---- working step + EQP multipliers -------------------------------
    ws = compute_working_step(
        data, it, aug_jac, state.trust_radius, settings.eps
    )
    multipliers = it.cons_dual + penalty * ws.violated_mult

    if settings.hess_eval == HessEval.EXACT:
        if is_dynamic:

            def hess_prod(d):
                general_mult = multipliers[: problem.num_general]
                return problem.func.hess_prod_dyn(
                    it.x, d, general_mult, state.error_bound, penalty
                )

        else:

            def hess_prod(d):
                return problem.hess_prod(it.x, d, multipliers)

    else:

        def hess_prod(d):
            return qn_product(qn, d, settings.hess_eval, blocks=qn_blocks)

    # ---- Cauchy direction + linesearch (or parametric sweep) ----------
    from .types import ParametricCauchy

    lp_tr_current = state.lp_trust_radius
    use_parametric = (
        m > 0
        and settings.parametric_cauchy != ParametricCauchy.DISABLED
        and settings.use_quadratic_model
    )
    if use_parametric:
        from .parametric import parametric_solve

        cres, lp_tr_current, cauchy_dir, cauchy_merit = parametric_solve(
            settings.parametric_cauchy,
            data,
            it,
            hess_prod,
            penalty,
            lp_tr_current,
            cres,
            settings.cauchy_eta,
            settings.eps,
            lp_solver=lp_backend,
            pdlp_tol=settings.pdlp_tol,
            compute_dtype=cdtype,
        )
        # re-extract the working set at the accepted radius and rebuild
        # the KKT factorization + working step (cauchy_step.c:205-231)
        it = dataclasses.replace(
            it, var_states=cres.var_states, cons_states=cres.cons_states
        )
        aug_jac = aug_jac_create(
            it.cons_jac,
            it.var_states,
            it.cons_states,
            method=_aug_jac_method(settings),
        )
        ws = compute_working_step(
            data, it, aug_jac, state.trust_radius, settings.eps
        )
        multipliers = it.cons_dual + penalty * ws.violated_mult
        full_cauchy = jnp.asarray(True)
    else:
        cauchy_dir = make_direction(it, cres.lp_step, hess_prod(cres.lp_step))
        if settings.use_quadratic_model:
            cauchy_dir, full_cauchy, cauchy_merit = cauchy_linesearch(
                data,
                it,
                cauchy_dir,
                penalty,
                state.trust_radius,
                settings.cauchy_tau,
                settings.cauchy_eta,
                settings.eps,
            )
        else:
            full_cauchy = jnp.asarray(True)
            cauchy_merit = merit_linear(data, it, cauchy_dir, penalty)

    # ---- Newton/EQP step + trial linesearch ---------------------------
    # EQP solver choice (reference eqp.c): Gauss-Newton + LSQR for LSQ
    # functions with exact Hessian mode, projected-CG Newton otherwise.
    from .problem import LSQFunc
    from .types import TRSolver

    use_gauss_newton = (
        isinstance(problem.func, LSQFunc)
        and settings.hess_eval == HessEval.EXACT
        and settings.tr_solver in (TRSolver.AUTO, TRSolver.LSQR)
    )

    if settings.perform_newton_step and settings.use_quadratic_model:
        if use_gauss_newton:
            from .gauss_newton import compute_gauss_newton_step

            newton = compute_gauss_newton_step(
                problem,
                data,
                it,
                aug_jac,
                ws,
                penalty,
                settings.max_newton_iterations,
            )
        else:
            # AUTO picks GLTR (trlib) unless the Hessian is declared PSD
            # (newton.c:96-106); benchmarked ~40% fewer iterations and
            # lower batch wall time than Steihaug CG on HS71.
            use_gltr = settings.tr_solver == TRSolver.GLTR or (
                settings.tr_solver == TRSolver.AUTO
                and not problem.func.psd_hessian
            )
            # Natively-float32 Hessian operator for the mixed-precision
            # Krylov loop: AD traced at the cast iterate (exact mode) or a
            # cast QN ring buffer, so the loop contains no emulated-f64 ops.
            hess_prod_c = None
            if cdtype is not None:
                if settings.hess_eval == HessEval.EXACT:
                    if not is_dynamic:
                        x_c = it.x.astype(cdtype)

                        def hess_prod_c(d, _x=x_c):
                            return problem.hess_prod(
                                _x, d, multipliers.astype(cdtype)
                            )

                else:
                    qn_c = jax.tree_util.tree_map(
                        lambda a: a.astype(cdtype)
                        if jnp.issubdtype(a.dtype, jnp.floating)
                        else a,
                        qn,
                    )

                    def hess_prod_c(d, _q=qn_c):
                        return qn_product(
                            _q, d, settings.hess_eval, blocks=qn_blocks
                        )

            newton = compute_newton_step(
                data,
                it,
                aug_jac,
                ws,
                hess_prod,
                penalty,
                settings.max_newton_iterations,
                use_gltr=use_gltr,
                compute_dtype=cdtype,
                hess_prod_compute=hess_prod_c,
            )
        from .types import Linesearch

        if settings.linesearch == Linesearch.EXACT:
            trial_dir, alpha, model_trial = trial_linesearch_exact(
                data,
                it,
                cauchy_dir,
                cauchy_merit,
                newton.direction,
                penalty,
                settings.linesearch_cutoff,
            )
        else:
            trial_dir, alpha, model_trial = trial_linesearch(
                data,
                it,
                cauchy_dir,
                cauchy_merit,
                newton.direction,
                penalty,
                settings.linesearch_tau,
                settings.linesearch_eta,
                settings.linesearch_cutoff,
            )
        failed_eqp = alpha == 0.0
        min_ray, max_ray = newton.tr.min_rayleigh, newton.tr.max_rayleigh
    else:
        trial_dir = cauchy_dir
        model_trial = cauchy_merit
        failed_eqp = jnp.asarray(False)
        min_ray = jnp.asarray(0.0, dtype=dtype)
        max_ray = jnp.asarray(0.0, dtype=dtype)

    # ---- numerical invariant checks (trial_point.c:620-708) -----------
    # Static debug mode: re-derive the direction bundle and the model
    # merit from first principles and compare (sleqp_direction_check +
    # the trial-merit num-assert), plus finiteness of solver-computed
    # quantities (math_error.h analogue).  Violations are recorded as a
    # bitmask; host loops raise MATH_ERROR on a nonzero value.
    if settings.num_asserts:
        _d = trial_dir.primal

        def _close(a, b):
            return jnp.all(
                jnp.abs(a - b)
                <= settings.eps
                * (1.0 + jnp.maximum(jnp.abs(a), jnp.abs(b)))
            )

        ok_dir = (
            _close(it.obj_grad @ _d, trial_dir.obj_dot)
            & _close(it.cons_jac @ _d, trial_dir.cons_jac_dot)
            & _close(hess_prod(_d), trial_dir.hess)
        )
        if settings.use_quadratic_model:
            _m_re = merit_quadratic(data, it, trial_dir, penalty)
        else:
            _m_re = merit_linear(data, it, trial_dir, penalty)
        ok_merit = _close(_m_re, model_trial)
        ok_finite = (
            jnp.all(jnp.isfinite(_d))
            & jnp.all(jnp.isfinite(it.vars_dual))
            & jnp.all(jnp.isfinite(it.cons_dual))
        )
        num_assert_fail = (
            jnp.where(ok_dir, 0, 1)
            + jnp.where(ok_merit, 0, 2)
            + jnp.where(ok_finite, 0, 4)
        ).astype(jnp.int32)
    else:
        num_assert_fail = jnp.asarray(0, jnp.int32)

    # ---- solver-level local-infeasibility stall test ------------------
    # (trial_point.c:450-485 sleqp_trial_point_solver_locally_infeasible):
    # infeasible iterate + (numerically) zero LP step + zero trial step
    # means neither first- nor second-order information can move — hand
    # over to the restoration phase instead of grinding the radius down
    # to the deadpoint bound.  This is the escape from penalty-degenerate
    # stalls (g ~ penalty J^T 1 ties every LP vertex, e.g. HS64).
    if m > 0:
        li_stall = (
            (~is_feasible)
            & (jnp.linalg.norm(cres.lp_step) <= settings.eps)
            & (jnp.linalg.norm(trial_dir.primal) <= settings.eps)
        )
        locally_infeasible = locally_infeasible | li_stall

    # ---- trial evaluation + step rule ---------------------------------
    x_trial = problem.clip_to_bounds(it.x + trial_dir.primal)
    if is_dynamic:
        t_obj, t_grad, t_cons, t_jac, trial_err = problem.func.eval_all_dyn(
            x_trial, state.error_bound, penalty
        )
        trial_it = Iterate(
            x=x_trial,
            obj_val=t_obj,
            obj_grad=t_grad,
            cons_val=t_cons,
            cons_jac=t_jac,
            cons_dual=jnp.zeros((m,), dtype=dtype),
            vars_dual=jnp.zeros((n,), dtype=dtype),
            var_states=jnp.zeros((n,), dtype=jnp.int8),
            cons_states=jnp.zeros((m,), dtype=jnp.int8),
        )
    else:
        trial_it = create_iterate(problem, x_trial)
        trial_err = jnp.asarray(0.0, dtype=dtype)
    exact_trial = merit_func(data, trial_it, penalty)
    accepted, ratio, sr_accept, sr_reject = apply_step_rule(
        settings.step_rule,
        state.step_rule,
        merit_val,
        exact_trial,
        model_trial,
        settings.accepted_reduction,
    )
    # ---- manual / non-finite trial rejection ---------------------------
    # Reference: the set_value reject flag (pub_func.h:40-44) discards the
    # step exactly like a merit rejection (iteration.c:416-456); under jit
    # the user cannot raise, so rejection is the traced accept_point
    # predicate plus an unconditional non-finite guard.
    trial_valid = (
        problem.func.point_valid(x_trial)
        & jnp.isfinite(trial_it.obj_val)
        & jnp.all(jnp.isfinite(trial_it.cons_val))
    )
    accepted = accepted & trial_valid
    ratio = jnp.where(trial_valid, ratio, -1.0)

    # ---- dynamic accuracy gate (trial_point.c:797-905) ----------------
    # An insufficiently accurate evaluation cannot be trusted by the step
    # rule: reject and tighten the bound; the next iteration re-evaluates.
    error_bound_next = state.error_bound
    refresh_next = jnp.asarray(False)
    skip_soc = jnp.asarray(False)
    if is_dynamic:
        model_reduction = merit_val - model_trial
        required = required_error_bound(
            settings.accepted_reduction, jnp.maximum(model_reduction, 0.0)
        )
        total_err = jnp.maximum(iterate_err, trial_err)
        insufficient = total_err > required
        accepted = accepted & ~insufficient
        error_bound_next = jnp.where(
            insufficient,
            jnp.minimum(state.error_bound, required),
            state.error_bound,
        )
        refresh_next = insufficient
        skip_soc = insufficient

    chosen_it = trial_it
    soc_accepted = jnp.asarray(False)
    sr_soc = sr_reject

    # ---- second-order correction (iteration.c:484-560) ----------------
    if m > 0 and settings.perform_soc:

        def soc_branch(_):
            # bound residuals of the working set at the trial point
            trial_like = dataclasses.replace(
                it, x=trial_it.x, cons_val=trial_it.cons_val
            )
            rhs = _working_set_rhs(data, trial_like)
            soc_dir = solve_min_norm(aug_jac, rhs)
            soc_primal = trial_dir.primal + soc_dir
            norm_ok = jnp.linalg.norm(soc_primal) <= (
                SOC_SAFEGUARD_FACTOR * state.trust_radius
            )
            x_soc = problem.clip_to_bounds(it.x + soc_primal)
            soc_it = create_iterate(problem, x_soc)
            soc_exact = merit_func(data, soc_it, penalty)
            soc_ok, soc_ratio, soc_sr_acc, _ = apply_step_rule(
                settings.step_rule,
                sr_reject,
                merit_val,
                soc_exact,
                model_trial,
                settings.accepted_reduction,
            )
            # SOC trial point gets its own manual/non-finite rejection
            # (iteration.c:516-544)
            soc_valid = (
                problem.func.point_valid(x_soc)
                & jnp.isfinite(soc_it.obj_val)
                & jnp.all(jnp.isfinite(soc_it.cons_val))
            )
            ok = norm_ok & soc_ok & soc_valid
            soc_ratio = jnp.where(soc_valid, soc_ratio, -1.0)
            return ok, soc_it, soc_ratio, soc_sr_acc

        def no_soc(_):
            return jnp.asarray(False), trial_it, ratio, sr_reject

        soc_accepted, soc_it, soc_ratio, sr_soc = lax.cond(
            accepted | skip_soc, no_soc, soc_branch, None
        )
        chosen_it = _tree_where(soc_accepted, soc_it, trial_it)
        ratio = jnp.where(soc_accepted, soc_ratio, ratio)

    final_accept = accepted | soc_accepted
    sr_next = _tree_where(
        accepted, sr_accept, _tree_where(soc_accepted, sr_soc, sr_reject)
    )

    # ---- trust-radius updates -----------------------------------------
    trial_step_norm = jnp.linalg.norm(trial_dir.primal)
    trial_step_infnorm = jnp.max(jnp.abs(trial_dir.primal), initial=0.0)
    cauchy_step_infnorm = jnp.max(jnp.abs(cauchy_dir.primal), initial=0.0)
    new_trust_radius = _update_trust_radius(
        state.trust_radius, ratio, final_accept, trial_step_norm, settings.eps
    )
    new_lp_trust_radius = _update_lp_trust_radius(
        lp_tr_current,
        final_accept,
        trial_step_infnorm,
        cauchy_step_infnorm,
        full_cauchy,
    )
    # accuracy-driven rejections refine the evaluation, not the step: the
    # reference recomputes within the iteration and leaves the radii alone
    new_trust_radius = jnp.where(
        skip_soc, state.trust_radius, new_trust_radius
    )
    new_lp_trust_radius = jnp.where(
        skip_soc, lp_tr_current, new_lp_trust_radius
    )
    boundary_step = trial_step_norm >= state.trust_radius * (1.0 - settings.eps)

    step_type = jnp.where(
        final_accept,
        jnp.where(
            soc_accepted,
            StepType.ACCEPTED_SOC,
            jnp.where(full_cauchy, StepType.ACCEPTED_FULL, StepType.ACCEPTED),
        ),
        StepType.REJECTED,
    ).astype(jnp.int32)

    next_it = _tree_where(final_accept, chosen_it, it)

    # record the pre-step point for the next QN pair (pushed next
    # iteration once the new duals are available)
    if settings.hess_eval != HessEval.EXACT:
        qn_prev_next = QNPrev(
            x=jnp.where(final_accept, it.x, state.qn_prev.x),
            grad=jnp.where(final_accept, it.obj_grad, state.qn_prev.grad),
            jac=jnp.where(final_accept, it.cons_jac, state.qn_prev.jac),
            pending=final_accept,
        )
    else:
        qn_prev_next = state.qn_prev
    qn_next = qn

    running_state = SolverState(
        it=next_it,
        trust_radius=new_trust_radius,
        lp_trust_radius=new_lp_trust_radius,
        penalty=penalty,
        basis=cres.basis,
        iteration=state.iteration + 1,
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        last_step_type=step_type,
        num_feasible_steps=num_feasible_steps,
        num_global_resets=num_global_resets,
        num_accepted=state.num_accepted
        + (final_accept & ~soc_accepted).astype(jnp.int32),
        num_soc_accepted=state.num_soc_accepted + soc_accepted.astype(jnp.int32),
        num_rejected=state.num_rejected + (~final_accept).astype(jnp.int32),
        num_failed_eqp=state.num_failed_eqp + failed_eqp.astype(jnp.int32),
        feas_res=feas_res,
        slack_res=slack_res,
        stat_res=stat_res,
        min_rayleigh=min_ray,
        max_rayleigh=max_ray,
        lp_iterations=state.lp_iterations + cres.lp_iterations,
        boundary_step=boundary_step,
        qn=qn_next,
        qn_prev=qn_prev_next,
        step_rule=sr_next,
        error_bound=error_bound_next,
        error_est=jnp.where(final_accept, trial_err, iterate_err),
        refresh_eval=refresh_next,
        last_model_reduction=merit_val - model_trial,
        last_exact_reduction=merit_val - exact_trial,
        last_reduction_ratio=ratio,
        measure=compute_measure(data, it, trial_it, trial_dir, multipliers),
        # sticky across iterations so fused while_loop solves surface it
        num_assert_fail=state.num_assert_fail | num_assert_fail,
    )

    # ---- early termination: keep the (duals-updated) iterate ----------
    stop = optimal | unbounded | locally_infeasible | deadpoint
    stop_status = jnp.where(
        optimal,
        Status.OPTIMAL,
        jnp.where(
            unbounded,
            Status.UNBOUNDED,
            jnp.where(
                locally_infeasible, Status.INFEASIBLE, Status.ABORT_DEADPOINT
            ),
        ),
    ).astype(jnp.int32)
    stopped_state = dataclasses.replace(
        state,
        it=it,
        status=stop_status,
        feas_res=feas_res,
        slack_res=slack_res,
        stat_res=stat_res,
        basis=cres.basis,
        num_assert_fail=state.num_assert_fail | num_assert_fail,
    )

    return _tree_where(stop, stopped_state, running_state)


@partial(jax.jit, static_argnums=(0, 1, 3))
def solve_jit(
    problem: Problem,
    settings: Settings,
    state0: SolverState,
    max_iterations: int,
) -> SolverState:
    """Full solve as one compiled while_loop (solve.c:95-252)."""

    def cond(s):
        return (s.status == Status.RUNNING) & (s.iteration < max_iterations)

    def body(s):
        return perform_iteration(problem, settings, s)

    final = lax.while_loop(cond, body, state0)
    # iteration-limit statuses
    hit_limit = (final.status == Status.RUNNING) & (
        final.iteration >= max_iterations
    )
    return dataclasses.replace(
        final,
        status=jnp.where(
            hit_limit, Status.ABORT_ITER, final.status
        ).astype(jnp.int32),
    )


def solve(
    problem: Problem,
    settings: Settings,
    x0: Array,
    max_iterations: int = 1000,
) -> SolverState:
    """Convenience driver: init + jitted solve."""
    state0 = initial_state(problem, settings, x0)
    return solve_jit(problem, settings, state0, max_iterations)
