"""End-to-end SQP solver tests against analytic optima.

Assertion style mirrors the reference unit tests (unconstrained_test.c:34-44):
solve within 100 iterations, expect OPTIMAL, solution within 1e-6.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu import Settings, Status
from sleqp_tpu.problem_solver import solve

from fixtures import (
    hs6_problem,
    hs35_problem,
    hs71_problem,
    linear_problem,
    quadcons_problem,
    quadfunc_problem,
    rosenbrock_problem,
)

SETTINGS = Settings()


def _solve_and_check(make, max_iterations=100, tol=1e-6):
    problem, x0, x_opt = make()
    state = solve(problem, SETTINGS, x0, max_iterations=max_iterations)
    assert int(state.status) == Status.OPTIMAL, (
        f"status={Status(int(state.status)).name} iter={int(state.iteration)} "
        f"feas={float(state.feas_res):.2e} stat={float(state.stat_res):.2e} "
        f"slack={float(state.slack_res):.2e} x={np.asarray(state.it.x)}"
    )
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=tol)
    return state


def test_quadfunc():
    _solve_and_check(quadfunc_problem)


def test_rosenbrock():
    _solve_and_check(rosenbrock_problem)


def test_linear():
    _solve_and_check(linear_problem)


def test_quadcons():
    _solve_and_check(quadcons_problem)


def test_hs6():
    _solve_and_check(hs6_problem)


def test_hs35():
    _solve_and_check(hs35_problem)


def test_hs71():
    state = _solve_and_check(hs71_problem, tol=2e-5)
    # KKT residua within reference default tolerances
    assert float(state.feas_res) <= 1e-6
    assert float(state.stat_res) <= 1e-6
    assert float(state.slack_res) <= 1e-6


def test_residuals_reported():
    problem, x0, _ = rosenbrock_problem()
    state = solve(problem, SETTINGS, x0, max_iterations=100)
    assert float(state.stat_res) < 1e-6
    assert int(state.num_accepted) > 0


def test_multistart_escapes_hs33_basin():
    """hs33 converges to the alternate local minimum f = -4 from the
    standard start (PARITY.md §7 won't-fix for the single-start
    solver); the batched multistart driver must recover the global
    f = -4.586 by riding the vmap batch dimension."""
    import numpy as np

    from sleqp_tpu import Settings, Status
    from sleqp_tpu.harness.driver import get_problem
    from sleqp_tpu.parallel.batch import multistart_solve

    problem, x0, f_opt = get_problem("hs33")
    out = multistart_solve(
        problem,
        Settings(),
        x0,
        num_starts=8,
        radius=2.0,
        seed=0,
        max_iterations=200,
    )
    assert int(out.status) == Status.OPTIMAL
    assert abs(float(out.it.obj_val) - f_opt) <= 1e-4 * (1 + abs(f_opt)), (
        float(out.it.obj_val),
        f_opt,
    )
