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


def test_forcing_constraint_fixes_variables():
    """A row whose implied max activity equals its lower bound forces
    every participating variable to the activity-maximizing bound
    (preprocessor.c:372-431)."""

    def obj(x):
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=3)
    problem = Problem(
        func,
        var_lb=[0.0, 0.0, -1.0],
        var_ub=[1.0, 2.0, 1.0],
        # x0 - x2 >= 2 only achievable at x0 = 1 (ub), x2 = -1 (lb)
        linear_coeffs=jnp.array([[1.0, 0.0, -1.0]]),
        linear_lb=jnp.array([2.0]),
        linear_ub=jnp.array([jnp.inf]),
    )
    pre = preprocess(problem)
    assert pre.result == PreprocessingResult.SUCCESS
    assert len(pre.forcing) == 1
    assert pre.forcing[0].at_lower
    assert pre.problem.num_linear == 0
    # both row variables fixed; x1 survives
    assert set(pre.fixed_vars.tolist()) == {0, 2}
    fv = dict(zip(pre.fixed_vars.tolist(), pre.fixed_values.tolist()))
    assert fv[0] == 1.0 and fv[2] == -1.0


def test_forcing_constraint_restore_duals():
    """End-to-end: the restored iterate attributes the forced variables'
    stationarity residuals to the forcing row's dual with correct signs
    (restore.c:384-502)."""

    def obj(x):
        # gradient at the forced point (1, x1, -1): (2, ., -2)
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=3)
    problem = Problem(
        func,
        var_lb=[0.0, -1.0, -1.0],
        var_ub=[1.0, 1.0, 1.0],
        linear_coeffs=jnp.array([[1.0, 0.0, -1.0]]),
        linear_lb=jnp.array([2.0]),
        linear_ub=jnp.array([jnp.inf]),
    )
    solver = Solver(
        problem, jnp.array([0.5, 0.5, 0.0]), Settings(enable_preprocessor=True)
    )
    assert solver.solve(max_iterations=50) == Status.OPTIMAL
    np.testing.assert_allclose(solver.solution, [1.0, 0.0, -1.0], atol=1e-6)
    # stationarity of the restored iterate: grad + A^T lam + nu = 0 with
    # lower-active row dual lam <= 0
    lam = float(solver.cons_dual[0])
    nu = np.asarray(solver.vars_dual)
    grad = np.array([2.0, 0.0, -2.0])
    A = np.array([[1.0, 0.0, -1.0]])
    np.testing.assert_allclose(grad + A.T @ [lam] + nu, 0.0, atol=1e-6)
    assert lam <= 1e-12


def test_forcing_upper_bound():
    """Symmetric case: implied min activity equals the row upper bound."""

    def obj(x):
        return (x[0] - 5.0) ** 2 + (x[1] + 5.0) ** 2

    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        var_lb=[0.0, -1.0],
        var_ub=[1.0, 1.0],
        # x0 - x1 <= -1 only achievable at x0 = 0 (lb), x1 = 1 (ub)
        linear_coeffs=jnp.array([[1.0, -1.0]]),
        linear_lb=jnp.array([-jnp.inf]),
        linear_ub=jnp.array([-1.0]),
    )
    pre = preprocess(problem)
    assert pre.result == PreprocessingResult.SUCCESS
    assert len(pre.forcing) == 1
    assert not pre.forcing[0].at_lower
    fv = dict(zip(pre.fixed_vars.tolist(), pre.fixed_values.tolist()))
    assert fv[0] == 0.0 and fv[1] == 1.0


def test_implied_bound_infeasibility():
    """Bound tightening proves infeasibility that single-row activity
    checks miss (preprocessor.c:176-258 + check_for_variable_...)."""

    def obj(x):
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        var_lb=[0.0, 0.0],
        var_ub=[10.0, 10.0],
        # x0 + x1 <= 1  and  x0 - x1 >= 5: first row implies x0 <= 1,
        # second requires x0 >= 5 + x1 >= 5 -> empty implied interval
        linear_coeffs=jnp.array([[1.0, 1.0], [1.0, -1.0]]),
        linear_lb=jnp.array([-jnp.inf, 5.0]),
        linear_ub=jnp.array([1.0, jnp.inf]),
    )
    pre = preprocess(problem)
    assert pre.result == PreprocessingResult.INFEASIBLE


def test_converted_bound_dual_restore():
    """An active bound that came from a singleton row is re-attributed to
    the original constraint on restore (restore.c:506-570)."""

    def obj(x):
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        linear_coeffs=jnp.array([[2.0, 0.0]]),
        linear_lb=jnp.array([4.0]),
        linear_ub=jnp.array([jnp.inf]),
    )
    solver = Solver(
        problem, jnp.array([3.0, 1.0]), Settings(enable_preprocessor=True)
    )
    assert solver.solve(max_iterations=50) == Status.OPTIMAL
    np.testing.assert_allclose(solver.solution, [2.0, 0.0], atol=1e-6)
    # stationarity: grad + A^T lam = 0 -> [4, 0] + [2, 0]^T lam = 0
    np.testing.assert_allclose(float(solver.cons_dual[0]), -2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(solver.vars_dual), 0.0, atol=1e-6)
