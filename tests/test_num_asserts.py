"""Numerical invariant checks (SLEQP_ENABLE_NUM_ASSERTS analogue;
reference: trial_point.c:620-708, cmake/Sanitizers.cmake CI builds)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu import MathError, Problem, Settings, Status
from sleqp_tpu.problem_solver import solve
from sleqp_tpu.solver import Solver

from fixtures import hs71_problem, rosenbrock_problem


def test_num_asserts_clean_constrained():
    """All invariants hold through a full constrained solve."""
    problem, x0, x_opt = hs71_problem()
    state = solve(
        problem, Settings(num_asserts=True), x0, max_iterations=100
    )
    assert int(state.status) == Status.OPTIMAL
    assert int(state.num_assert_fail) == 0
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=1e-5)


def test_num_asserts_clean_quasi_newton():
    from sleqp_tpu.types import HessEval

    problem, x0, _ = rosenbrock_problem()
    state = solve(
        problem,
        Settings(num_asserts=True, hess_eval=HessEval.DAMPED_BFGS),
        x0,
        max_iterations=300,
    )
    assert int(state.status) == Status.OPTIMAL
    assert int(state.num_assert_fail) == 0


def test_num_asserts_detect_nonfinite():
    """A gradient that is non-finite at the start poisons the duals; the
    finiteness invariant fires and the host loop raises MATH_ERROR."""
    from sleqp_tpu import Func

    def obj(x):
        return jnp.sqrt(x[0]) + x[1] ** 2  # d/dx0 -> inf at x0 = 0

    func = Func(obj, num_variables=2)
    problem = Problem(func, var_lb=[0.0, -5.0], var_ub=[5.0, 5.0])
    solver = Solver(problem, jnp.array([0.0, 1.0]), Settings(num_asserts=True))
    with pytest.raises(MathError) as exc:
        solver.solve(max_iterations=10)
    assert exc.value.bitmask & 4


def test_float_flags_error_on_nonfinite():
    """float_error_flags="nonfinite" (FLOAT_ERROR_FLAGS analogue,
    math_error.h:33-48): non-finite function values at a host-visible
    iterate raise MATH_ERROR instead of silently propagating."""
    from sleqp_tpu import Func

    def obj(x):
        # finite at x0, overflows to inf as x grows
        return jnp.exp(x[0] * 500.0) + jnp.vdot(x, x)

    func = Func(obj, num_variables=2)
    problem = Problem(func, var_lb=-10.0, var_ub=10.0)
    solver = Solver(
        problem,
        jnp.array([4.0, 1.0]),
        Settings(float_error_flags="nonfinite"),
    )
    with pytest.raises(MathError):
        solver.solve(max_iterations=10)


def test_float_flags_warning_default(caplog):
    """Default float_warning_flags="nonfinite" logs instead of raising
    (FLOAT_WARN_FLAGS_DEFAULT = FE_ALL_EXCEPT, settings.c:50)."""
    import logging

    from sleqp_tpu import Func

    def obj(x):
        return jnp.exp(x[0] * 500.0) + jnp.vdot(x, x)

    func = Func(obj, num_variables=2)
    problem = Problem(func, var_lb=-10.0, var_ub=10.0)
    solver = Solver(problem, jnp.array([4.0, 1.0]), Settings())
    with caplog.at_level(logging.WARNING, logger="sleqp_tpu"):
        solver.solve(max_iterations=10)
    assert any("non-finite" in r.message for r in caplog.records)
