"""Solver variant tests: exact linesearch, window/minstep step rules.

Mirrors the reference step_rule_test.c coverage: all rules solve the
fixtures to the same optima.
"""

import numpy as np
import pytest

from sleqp_tpu import Linesearch, Settings, Status, StepRule
from sleqp_tpu.problem_solver import solve

from fixtures import (
    hs6_problem,
    hs71_problem,
    quadcons_problem,
    rosenbrock_problem,
)

CASES = [rosenbrock_problem, quadcons_problem, hs6_problem, hs71_problem]


@pytest.mark.parametrize("make", CASES)
def test_exact_linesearch(make):
    problem, x0, x_opt = make()
    settings = Settings(linesearch=Linesearch.EXACT)
    state = solve(problem, settings, x0, max_iterations=200)
    assert int(state.status) == Status.OPTIMAL, (
        f"{make.__name__}: {Status(int(state.status)).name} "
        f"stat={float(state.stat_res):.2e} feas={float(state.feas_res):.2e}"
    )
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=2e-5)


@pytest.mark.parametrize("rule", [StepRule.WINDOW, StepRule.MINSTEP])
@pytest.mark.parametrize("make", CASES)
def test_step_rules(rule, make):
    problem, x0, x_opt = make()
    settings = Settings(step_rule=rule)
    state = solve(problem, settings, x0, max_iterations=200)
    assert int(state.status) == Status.OPTIMAL, (
        f"{make.__name__}/{rule.name}: {Status(int(state.status)).name}"
    )
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=2e-5)


def test_linear_model_only():
    """use_quadratic_model=False runs the pure SLP path."""
    problem, x0, x_opt = quadcons_problem()
    settings = Settings(use_quadratic_model=False, perform_newton_step=False)
    state = solve(problem, settings, x0, max_iterations=500)
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=1e-4)


def test_no_newton_quadratic():
    """Cauchy-only with quadratic model (perform_newton_step=False)."""
    problem, x0, x_opt = rosenbrock_problem()
    settings = Settings(perform_newton_step=False)
    state = solve(problem, settings, x0, max_iterations=2000)
    assert int(state.status) in (Status.OPTIMAL, Status.ABORT_ITER)


@pytest.mark.parametrize(
    "mode", ["COARSE", "FINE"]
)
@pytest.mark.parametrize("make", [quadcons_problem, hs71_problem])
def test_parametric_cauchy(mode, make):
    from sleqp_tpu.types import ParametricCauchy

    problem, x0, x_opt = make()
    settings = Settings(parametric_cauchy=ParametricCauchy[mode])
    state = solve(problem, settings, x0, max_iterations=200)
    assert int(state.status) == Status.OPTIMAL, (
        f"{make.__name__}/{mode}: {Status(int(state.status)).name}"
    )
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=2e-5)


def test_direct_aug_jac_method():
    from sleqp_tpu.types import AugJacMethod

    problem, x0, x_opt = hs71_problem()
    settings = Settings(aug_jac_method=AugJacMethod.DIRECT)
    state = solve(problem, settings, x0, max_iterations=200)
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=2e-5)


@pytest.mark.parametrize("est", ["LP", "MIXED"])
def test_dual_estimation_types(est):
    from sleqp_tpu.types import DualEstimationType

    problem, x0, x_opt = hs71_problem()
    settings = Settings(dual_estimation_type=DualEstimationType[est])
    state = solve(problem, settings, x0, max_iterations=200)
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=2e-5)


def test_initial_tr_choice():
    """WIDE initial radii (Knitro default, problem_solver.c:92-105):
    trust_radius = sqrt(n), lp_trust_radius = 0.8; NARROW: 1 and
    0.8/sqrt(n).  Both choices must solve the fixtures."""
    from sleqp_tpu import InitialTRChoice
    from sleqp_tpu.problem_solver import initial_state

    problem, x0, x_opt = hs71_problem()
    n = problem.num_variables

    narrow = initial_state(problem, Settings(), x0)
    assert float(narrow.trust_radius) == 1.0
    np.testing.assert_allclose(
        float(narrow.lp_trust_radius), 0.8 / np.sqrt(n)
    )

    wide_settings = Settings(initial_tr_choice=InitialTRChoice.WIDE)
    wide = initial_state(problem, wide_settings, x0)
    np.testing.assert_allclose(float(wide.trust_radius), np.sqrt(n))
    assert float(wide.lp_trust_radius) == 0.8

    state = solve(problem, wide_settings, x0, max_iterations=200)
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=2e-5)
