"""Top-level solver: restoration orchestration, callbacks, polishing, stats.

TPU-native equivalent of src/main/solver.c + solver/ (solve.c, phase.c,
print.c, state.c, callback.c): wraps the jitted problem solver with

* restoration-phase toggling on local infeasibility
  (solver/solve.c:195-238, restoration.c)
* post-solve working-set polishing (solver/solve.c:283-287, polish.c)
* event callbacks ACCEPTED_ITERATE / PERFORMED_ITERATION / FINISHED with
  abort support (pub_types.h:168-174, solver/callback.c)
* the per-iteration log table and the final stats banner
  (problem_solver/print.c, solver/print.c)
* a solution/state query API (pub_solver.h:26-100, pub_types.h:198-217)

Two execution paths: a fully fused `lax.while_loop` fast path (no
callbacks), and a Python-stepped path (one jitted iteration per step) when
callbacks, time limits, or per-iteration logging are requested.
"""

from __future__ import annotations

import enum
import logging
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .iterate import Iterate
from .polish import polish_iterate
from .problem import Problem
from .problem_solver import (
    SolverState,
    initial_state,
    perform_iteration,
    solve_jit,
)
from .restoration import (
    make_restoration_problem,
    restoration_initial_point,
    restoration_settings,
)
from .settings import Settings
from .types import SolverPhase, Status, StepType

logger = logging.getLogger("sleqp_tpu")

Array = jax.Array

MAX_PHASE_TOGGLES = 10


def _check_float_flags(settings: Settings, state: SolverState) -> None:
    """Float-exception surveillance on the current iterate.

    TPU analogue of math_error.h:33-63 (fetestexcept after each func
    evaluation): non-finite obj/cons values at the host-visible iterate
    raise MathError under ``float_error_flags="nonfinite"`` or log a
    warning under ``float_warning_flags="nonfinite"`` (reference default:
    warn on all FP exceptions, settings.c:50)."""
    if (
        settings.float_error_flags == "none"
        and settings.float_warning_flags == "none"
    ):
        return
    vals = np.concatenate(
        [
            np.atleast_1d(np.asarray(state.it.obj_val)),
            np.asarray(state.it.cons_val).ravel(),
        ]
    )
    if np.all(np.isfinite(vals)):
        return
    msg = (
        f"non-finite function values at iteration "
        f"{int(state.iteration)}: obj={float(state.it.obj_val)!r}"
    )
    if settings.float_error_flags == "nonfinite":
        from .types import MathError

        raise MathError(msg)
    logger.warning(msg)


class SolverEvent(enum.IntEnum):
    """Callback events (pub_types.h:168-174)."""

    ACCEPTED_ITERATE = 0
    PERFORMED_ITERATION = 1
    FINISHED = 2


_HEADER = (
    f"{'iter':>6} {'obj':>14} {'merit':>14} {'feas':>9} {'slack':>9} "
    f"{'stat':>9} {'penalty':>9} {'lp_tr':>9} {'eqp_tr':>9} {'step':>9}"
)


class Solver:
    """User-facing solver handle (reference SleqpSolver, pub_solver.h)."""

    def __init__(
        self,
        problem: Problem,
        x0,
        settings: Optional[Settings] = None,
        scaling=None,
    ):
        """``scaling`` composes power-of-two problem scaling into the
        solver chain (reference solver.c:278 builds scaling ->
        preprocessing -> problem_solver; the solution, duals and
        objective are unscaled automatically on the way out,
        solver/solve.c:270).  Accepts a ``scale.Scaling`` instance or
        the string ``"auto"`` to derive weights from the derivatives at
        ``x0`` (scale.c:640-740)."""
        self.original_problem = problem
        self.settings = settings if settings is not None else Settings()
        self._preprocessed = None
        self._restored_iterate = None
        self._scaled_problem = None
        if scaling is not None:
            from .scale import ScaledProblem, derive_scaling

            if isinstance(scaling, str):
                if scaling != "auto":
                    raise ValueError(
                        f"unknown scaling mode {scaling!r}; expected a "
                        "Scaling instance or 'auto'"
                    )
                scaling = derive_scaling(problem, x0)
            scaled = ScaledProblem(problem, scaling)
            x0 = scaled.scale_point(jnp.asarray(x0, problem.dtype))
            problem = scaled
            self._scaled_problem = scaled
        self.scaling = scaling
        if self.settings.enable_preprocessor:
            from .preprocessor import PreprocessingResult, preprocess

            pre = preprocess(problem)
            if pre.result == PreprocessingResult.SUCCESS:
                self._preprocessed = pre
                problem = pre.problem
                x0 = pre.reduce_point(jnp.asarray(x0, problem.dtype))
            else:
                self._preprocessed = pre  # infeasibility detected up front
        self.problem = problem
        self.x0 = jnp.asarray(x0, dtype=problem.dtype)
        self.state: Optional[SolverState] = None
        self.status = Status.UNKNOWN
        self.phase = SolverPhase.OPTIMIZATION
        self.num_phase_toggles = 0
        self.elapsed_seconds = 0.0
        self._callbacks: dict[SolverEvent, list[Callable]] = {
            e: [] for e in SolverEvent
        }
        self._abort_requested = False
        self._step_fn = None
        self._restoration = None  # (problem, settings) lazily created

    # -- callbacks ------------------------------------------------------

    def add_callback(self, event: SolverEvent, fn: Callable) -> None:
        self._callbacks[SolverEvent(event)].append(fn)

    def remove_callback(self, event: SolverEvent, fn: Callable) -> None:
        self._callbacks[SolverEvent(event)].remove(fn)

    def abort(self) -> None:
        """Request termination from a callback (pub_solver.h:64)."""
        self._abort_requested = True

    # -- solve ----------------------------------------------------------

    def _needs_python_loop(self, time_limit) -> bool:
        return (
            any(self._callbacks[e] for e in SolverEvent if e != SolverEvent.FINISHED)
            or time_limit is not None
            or logger.isEnabledFor(logging.INFO)
        )

    def solve(
        self,
        max_iterations: int = 1000,
        time_limit: Optional[float] = None,
    ) -> Status:
        start = time.perf_counter()
        self._abort_requested = False
        self.num_phase_toggles = 0

        # presolve proved infeasibility (pub_types.h:176-181)
        if self._preprocessed is not None and self._preprocessed.problem is None:
            self.status = Status.INFEASIBLE
            self.state = None
            self.elapsed_seconds = time.perf_counter() - start
            for fn in self._callbacks[SolverEvent.FINISHED]:
                fn(self)
            return self.status

        state = initial_state(self.problem, self.settings, self.x0)
        python_loop = self._needs_python_loop(time_limit)

        while True:
            if python_loop:
                state = self._solve_python(
                    state, max_iterations, time_limit, start
                )
            else:
                state = solve_jit(
                    self.problem, self.settings, state, max_iterations
                )
                if self.settings.num_asserts and int(state.num_assert_fail):
                    from .types import MathError

                    raise MathError(int(state.num_assert_fail))
                _check_float_flags(self.settings, state)

            status = Status(int(state.status))
            if (
                status != Status.INFEASIBLE
                or not self.settings.enable_restoration_phase
                or self.problem.num_cons == 0
                or self.num_phase_toggles >= MAX_PHASE_TOGGLES
            ):
                break
            # ---- restoration phase (solver/solve.c:195-238) -----------
            state = self._run_restoration(state, max_iterations)
            self.num_phase_toggles += 1
            if state is None:  # genuinely locally infeasible
                break

        if state is not None:
            polished = polish_iterate(
                self.problem.data,
                state.it,
                self.settings.polishing_type,
                self.settings.eps,
            )
            import dataclasses

            state = dataclasses.replace(state, it=polished)
            self.state = state
            self.status = Status(int(state.status))
            if self._preprocessed is not None:
                # map the reduced solution back (preprocessor restore.c)
                self._restored_iterate = self._preprocessed.restore_iterate(
                    state.it
                )
        self.elapsed_seconds = time.perf_counter() - start

        for fn in self._callbacks[SolverEvent.FINISHED]:
            fn(self)
        if logger.isEnabledFor(logging.INFO):
            self._print_stats()
        return self.status

    def _solve_python(self, state, max_iterations, time_limit, start):
        """Python-stepped loop with callbacks/time-limit/logging."""
        if self._step_fn is None:
            problem, settings = self.problem, self.settings
            self._step_fn = jax.jit(
                lambda s: perform_iteration(problem, settings, s)
            )
        import dataclasses

        logger.info(_HEADER)
        while True:
            if int(state.status) != Status.RUNNING:
                break
            if int(state.iteration) >= max_iterations:
                state = dataclasses.replace(
                    state, status=jnp.asarray(Status.ABORT_ITER, jnp.int32)
                )
                break
            if time_limit is not None and (
                time.perf_counter() - start > time_limit
            ):
                state = dataclasses.replace(
                    state, status=jnp.asarray(Status.ABORT_TIME, jnp.int32)
                )
                break
            if self._abort_requested:
                state = dataclasses.replace(
                    state, status=jnp.asarray(Status.ABORT_MANUAL, jnp.int32)
                )
                break
            prev_iter = int(state.iteration)
            state = self._step_fn(state)
            self.state = state
            if self.settings.num_asserts and int(state.num_assert_fail):
                from .types import MathError

                raise MathError(int(state.num_assert_fail))
            _check_float_flags(self.settings, state)
            if int(state.iteration) > prev_iter:
                self._log_iteration(state)
                for fn in self._callbacks[SolverEvent.PERFORMED_ITERATION]:
                    fn(self)
                if int(state.last_step_type) in (
                    StepType.ACCEPTED,
                    StepType.ACCEPTED_FULL,
                    StepType.ACCEPTED_SOC,
                ):
                    for fn in self._callbacks[SolverEvent.ACCEPTED_ITERATE]:
                        fn(self)
        return state

    def _run_restoration(self, state, max_iterations):
        """Solve the restoration problem from the current iterate."""
        logger.info("Entering restoration phase")
        if self._restoration is None:
            rest_problem = make_restoration_problem(self.problem)
            rest_settings = restoration_settings(self.settings)
            self._restoration = (rest_problem, rest_settings)
        rest_problem, rest_settings = self._restoration

        from .iterate import max_violation

        x = state.it.x
        z = restoration_initial_point(self.problem, x)
        # The reference exits restoration when the *original* iterate
        # becomes feasible (solver/solve.c:214-231), not when the
        # restoration LSQ reaches its own stationarity: with tiny
        # constraint Jacobians, ||J^T r|| passes stat_tol while the
        # residual (= original violation) is still large.  Emulate the
        # original-feasibility criterion by tightening the restoration
        # tolerances and continuing whenever its "optimum" leaves the
        # original infeasible.
        import dataclasses

        rs = rest_settings
        for _ in range(3):
            rest_state = solve_jit(
                rest_problem,
                rs,
                initial_state(rest_problem, rs, z),
                max_iterations,
            )
            rest_status = Status(int(rest_state.status))
            x_restored = rest_state.it.x[: self.problem.num_variables]
            c = self.problem.cons_val(x_restored)
            viol = float(max_violation(self.problem.data, c))
            if viol <= self.settings.feas_tol * 10 or rest_status not in (
                Status.OPTIMAL,
                Status.ABORT_ITER,
            ):
                break
            rs = rs.replace(
                stat_tol=rs.stat_tol * 1e-4, slack_tol=rs.slack_tol * 1e-4
            )
            z = rest_state.it.x

        logger.info(
            "Restoration finished with status %s (objective %.3e)",
            rest_status.name,
            float(rest_state.it.obj_val),
        )
        if viol <= self.settings.feas_tol * 10:
            # Toggle back per solver/phase.c:97-147 fill_optimization_iterate:
            # only the primal and the function values are refreshed; duals,
            # working set, trust radii, penalty, saved LP bases, and the
            # quasi-Newton memory all survive the phase switch (the
            # reference's problem solvers are created once and reused —
            # problem_solver/solve.c:137-148 resets only counters).
            import dataclasses

            from .iterate import create_iterate

            new_it = create_iterate(self.problem, x_restored)
            new_it = dataclasses.replace(
                new_it,
                cons_dual=state.it.cons_dual,
                vars_dual=state.it.vars_dual,
                var_states=state.it.var_states,
                cons_states=state.it.cons_states,
            )
            # Fresh trust radii for the new region (the collapsed radii
            # that triggered restoration describe the old stall
            # neighborhood; problem_solver.c:83-107 initial choice), and
            # penalty escalation per toggle: entering restoration means
            # the optimization phase stalled infeasible at the current
            # penalty — the usual Byrd update (penalty.c:5-50) is blind
            # exactly when the stall is penalty-degenerate
            # (g ~ penalty J^T 1, every LP vertex tied, e.g. HS64), so
            # the phase machinery supplies the escalation instead.
            from .problem_solver import TRUST_REGION_FACTOR

            n = self.problem.num_variables
            dtype = self.problem.dtype
            return dataclasses.replace(
                state,
                it=new_it,
                status=jnp.asarray(Status.RUNNING, jnp.int32),
                trust_radius=jnp.asarray(1.0, dtype=dtype),
                lp_trust_radius=jnp.asarray(
                    TRUST_REGION_FACTOR / float(np.sqrt(max(n, 1))),
                    dtype=dtype,
                ),
                penalty=state.penalty * 10.0,
            )
        # restoration converged but original still infeasible
        logger.info("Restoration could not restore feasibility")
        import dataclasses

        return dataclasses.replace(
            state, status=jnp.asarray(Status.INFEASIBLE, jnp.int32)
        )

    # -- logging --------------------------------------------------------

    def _log_iteration(self, state: SolverState) -> None:
        if not logger.isEnabledFor(logging.INFO):
            return
        if int(state.iteration) % 25 == 0:
            logger.info(_HEADER)
        step_names = {
            int(StepType.NONE): "-",
            int(StepType.ACCEPTED): "accepted",
            int(StepType.ACCEPTED_FULL): "full",
            int(StepType.ACCEPTED_SOC): "soc",
            int(StepType.REJECTED): "rejected",
        }
        if logger.isEnabledFor(logging.DEBUG):
            # per-step nonlinearity measures (reference measure.c:15-40)
            logger.debug(
                "model reduction %.6e, exact reduction %.6e, ratio %.3e",
                float(state.last_model_reduction),
                float(state.last_exact_reduction),
                float(state.last_reduction_ratio),
            )
            # obj-vs-violation model/actual split (measure.c:237-295)
            from .measure import format_measure

            logger.debug(
                "%s", format_measure(state.measure, float(state.penalty))
            )
        logger.info(
            "%6d %14.6e %14.6e %9.2e %9.2e %9.2e %9.2e %9.2e %9.2e %9s",
            int(state.iteration),
            float(state.it.obj_val),
            float(state.it.obj_val),
            float(state.feas_res),
            float(state.slack_res),
            float(state.stat_res),
            float(state.penalty),
            float(state.lp_trust_radius),
            float(state.trust_radius),
            step_names.get(int(state.last_step_type), "?"),
        )

    def _print_stats(self) -> None:
        """Final banner (solver/print.c:10-90)."""
        s = self.state
        logger.info("%s", "-" * 60)
        logger.info("Status        : %s", self.status.name)
        logger.info("Objective     : %.10e", float(s.it.obj_val))
        logger.info("Feas residuum : %.3e", float(s.feas_res))
        logger.info("Slack residuum: %.3e", float(s.slack_res))
        logger.info("Stat residuum : %.3e", float(s.stat_res))
        logger.info("Iterations    : %d", int(s.iteration))
        logger.info("Accepted      : %d", int(s.num_accepted))
        logger.info("SOC accepted  : %d", int(s.num_soc_accepted))
        logger.info("Rejected      : %d", int(s.num_rejected))
        logger.info("LP pivots     : %d", int(s.lp_iterations))
        logger.info("Elapsed       : %.3f s", self.elapsed_seconds)

    # -- solution queries (pub_solver.h:26-100) -------------------------

    @property
    def _solution_iterate(self) -> Iterate:
        """Solution in the (scaled) space the solver worked in, with any
        preprocessor reduction already undone."""
        if self._restored_iterate is not None:
            return self._restored_iterate
        return self.state.it

    @property
    def _original_iterate(self) -> Iterate:
        """Solution mapped back to the *original* problem space: the
        preprocessor restore (restore.c) composed with exact power-of-two
        unscaling (solver/solve.c:270, problem_scaling.c)."""
        it = self._solution_iterate
        sp = self._scaled_problem
        if sp is None:
            return it
        import dataclasses

        from .iterate import create_iterate

        x = sp.unscale_point(it.x)
        out = create_iterate(self.original_problem, x)
        return dataclasses.replace(
            out,
            cons_dual=sp.unscale_cons_dual(it.cons_dual),
            vars_dual=sp.unscale_vars_dual(it.vars_dual),
            var_states=it.var_states,
            cons_states=it.cons_states,
        )

    @property
    def solution(self) -> np.ndarray:
        return np.asarray(self._original_iterate.x)

    @property
    def obj_val(self) -> float:
        return float(self._original_iterate.obj_val)

    @property
    def cons_dual(self) -> np.ndarray:
        return np.asarray(self._original_iterate.cons_dual)

    @property
    def vars_dual(self) -> np.ndarray:
        return np.asarray(self._original_iterate.vars_dual)

    @property
    def iterations(self) -> int:
        return int(self.state.iteration)

    @property
    def iterate(self) -> Iterate:
        return self._original_iterate

    def residuals(self, original: bool = False) -> tuple[float, float, float]:
        """(feasibility, slackness, stationarity) residua.

        By default these are the residua the solver converged on (in the
        scaled space when scaling is active, matching the reference's
        internal accounting); ``original=True`` re-evaluates them on the
        unscaled iterate in the original problem space
        (problem_scaling_test.c checks optimality there)."""
        if original and self._scaled_problem is not None:
            from .iterate import (
                slack_residual_values,
                stationarity_residuals,
                violation_values,
            )

            it = self._original_iterate
            data = self.original_problem.data
            feas = float(
                jnp.max(
                    violation_values(it.cons_val, data.cons_lb, data.cons_ub),
                    initial=0.0,
                )
            )
            slack = max(
                float(
                    jnp.max(
                        jnp.abs(
                            slack_residual_values(
                                it.cons_val,
                                data.cons_lb,
                                data.cons_ub,
                                it.cons_dual,
                            )
                        ),
                        initial=0.0,
                    )
                ),
                float(
                    jnp.max(
                        jnp.abs(
                            slack_residual_values(
                                it.x, data.var_lb, data.var_ub, it.vars_dual
                            )
                        ),
                        initial=0.0,
                    )
                ),
            )
            stat = float(
                jnp.max(
                    jnp.abs(stationarity_residuals(data, it)), initial=0.0
                )
            )
            return feas, slack, stat
        s = self.state
        return (
            float(s.feas_res),
            float(s.slack_res),
            float(s.stat_res),
        )

    # solver state queries (pub_types.h:198-217)
    def state_real(self, name: str) -> float:
        mapping = {
            "trust_radius": self.state.trust_radius,
            "lp_trust_radius": self.state.lp_trust_radius,
            "penalty_parameter": self.state.penalty,
            "feas_res": self.state.feas_res,
            "slack_res": self.state.slack_res,
            "stat_res": self.state.stat_res,
            "min_rayleigh": self.state.min_rayleigh,
            "max_rayleigh": self.state.max_rayleigh,
            # nonlinearity diagnostics of the last step (measure.c)
            "obj_nonlin": self.state.measure.obj_nonlin,
            "cons_nonlin": self.state.measure.cons_nonlin,
            "lag_nonlin": self.state.measure.lag_nonlin,
            "step_norm": self.state.measure.step_norm,
        }
        return float(mapping[name])

    def state_vec(self, name: str) -> np.ndarray:
        """Vector state queries (pub_solver.h sleqp_solver_vec_state over
        SLEQP_SOLVER_STATE_VEC, pub_types.h:218-225).  The reference
        exposes the residual vectors in the scaled space; here they are
        evaluated on the (scaled) iterate the solver works on:

        * "stat_residuals":       per-variable stationarity residual
        * "feas_residuals":       per-constraint signed violation
        * "cons_slack_residuals": per-constraint complementary slackness
        * "var_slack_residuals":  per-variable complementary slackness
        """
        from .iterate import (
            slack_residual_values,
            stationarity_residuals,
            violation_values,
        )

        it = self._solution_iterate
        data = self.problem.data
        if name == "stat_residuals":
            vec = stationarity_residuals(data, it)
        elif name == "feas_residuals":
            vec = violation_values(it.cons_val, data.cons_lb, data.cons_ub)
        elif name == "cons_slack_residuals":
            vec = slack_residual_values(
                it.cons_val, data.cons_lb, data.cons_ub, it.cons_dual
            )
        elif name == "var_slack_residuals":
            vec = slack_residual_values(
                it.x, data.var_lb, data.var_ub, it.vars_dual
            )
        else:
            raise KeyError(name)
        return np.asarray(vec)

    def state_int(self, name: str) -> int:
        mapping = {
            "iteration": self.state.iteration,
            "last_step_type": self.state.last_step_type,
            "num_accepted": self.state.num_accepted,
            "num_soc_accepted": self.state.num_soc_accepted,
            "num_rejected": self.state.num_rejected,
            "num_failed_eqp": self.state.num_failed_eqp,
            "lp_iterations": self.state.lp_iterations,
        }
        return int(mapping[name])
