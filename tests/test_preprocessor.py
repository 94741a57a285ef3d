"""Preprocessor tests (reference: preprocessor/*_test.c)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu import Func, Problem, Settings, Status
from sleqp_tpu.preprocessor import PreprocessingResult, preprocess
from sleqp_tpu.solver import Solver


def _box_qp(fixed_var=True):
    """min (x0-1)^2 + (x1-2)^2 + (x2+3)^2 with x1 fixed at 5."""

    def obj(x):
        return (x[0] - 1.0) ** 2 + (x[1] - 2.0) ** 2 + (x[2] + 3.0) ** 2

    func = Func(obj, num_variables=3)
    lb = [-10.0, 5.0 if fixed_var else -10.0, -10.0]
    ub = [10.0, 5.0, 10.0]
    return Problem(func, var_lb=lb, var_ub=ub)


def test_fixed_variable_elimination():
    problem = _box_qp()
    pre = preprocess(problem)
    assert pre.result == PreprocessingResult.SUCCESS
    assert pre.problem.num_variables == 2
    np.testing.assert_array_equal(pre.fixed_vars, [1])
    np.testing.assert_allclose(pre.fixed_values, [5.0])
    # reduced objective evaluates with the fixed value substituted
    xr = jnp.array([1.0, -3.0])
    np.testing.assert_allclose(float(pre.problem.obj_val(xr)), 9.0)


def test_solve_with_preprocessor():
    problem = _box_qp()
    solver = Solver(problem, jnp.zeros(3), Settings(enable_preprocessor=True))
    status = solver.solve(max_iterations=100)
    assert status == Status.OPTIMAL
    np.testing.assert_allclose(solver.solution, [1.0, 5.0, -3.0], atol=1e-6)
    # fixed-variable dual reconstructed from stationarity: nu = -(grad)_1
    # grad_1 = 2*(5-2) = 6 -> nu_1 = -6
    np.testing.assert_allclose(solver.vars_dual[1], -6.0, atol=1e-6)


def test_singleton_row_to_bound():
    def obj(x):
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        linear_coeffs=jnp.array([[2.0, 0.0], [1.0, 1.0]]),
        linear_lb=jnp.array([4.0, -jnp.inf]),
        linear_ub=jnp.array([jnp.inf, 10.0]),
    )
    pre = preprocess(problem)
    assert pre.result == PreprocessingResult.SUCCESS
    # singleton row 2 x0 >= 4 becomes bound x0 >= 2; row removed
    assert pre.problem.num_linear == 1
    np.testing.assert_allclose(
        np.asarray(pre.problem.data.var_lb), [2.0, -np.inf]
    )


def test_redundant_row_removed():
    def obj(x):
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=1.0,
        linear_coeffs=jnp.array([[1.0, 1.0]]),
        linear_lb=-10.0,
        linear_ub=10.0,  # implied range [0, 2] inside [-10, 10]
    )
    pre = preprocess(problem)
    assert pre.problem.num_linear == 0


def test_infeasibility_detection():
    def obj(x):
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=1.0,
        linear_coeffs=jnp.array([[1.0, 1.0]]),
        linear_lb=5.0,  # max activity is 2 < 5
        linear_ub=jnp.inf,
    )
    pre = preprocess(problem)
    assert pre.result == PreprocessingResult.INFEASIBLE

    solver = Solver(problem, jnp.zeros(2), Settings(enable_preprocessor=True))
    assert solver.solve() == Status.INFEASIBLE


def test_fixed_vars_with_constraints():
    """General constraints survive reduction with correct Jacobian."""

    def obj(x):
        return x[0] ** 2 + x[2] ** 2

    def cons(x):
        return jnp.array([x[0] + x[1] * x[2]])

    func = Func(obj, num_variables=3, cons=cons, num_cons=1)
    problem = Problem(
        func,
        var_lb=[-5.0, 2.0, -5.0],
        var_ub=[5.0, 2.0, 5.0],
        general_lb=1.0,
        general_ub=jnp.inf,
    )
    solver = Solver(
        problem, jnp.array([1.0, 2.0, 1.0]), Settings(enable_preprocessor=True)
    )
    status = solver.solve(max_iterations=100)
    assert status == Status.OPTIMAL
    x = solver.solution
    assert x[1] == 2.0
    assert x[0] + x[1] * x[2] >= 1.0 - 1e-7
