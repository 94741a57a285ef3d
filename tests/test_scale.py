"""Tests for power-of-two scaling (reference: scale_test.c, problem_scaling_test.c)."""

import jax.numpy as jnp
import numpy as np

from sleqp_tpu import Settings, Status, create_iterate
from sleqp_tpu.problem_solver import solve
from sleqp_tpu.scale import ScaledProblem, Scaling

from fixtures import hs71_problem, rosenbrock_problem


def test_scaling_exactness():
    """Scale->unscale is the identity on floats (pub_scale.h:58-61)."""
    problem, x0, _ = hs71_problem()
    scaling = Scaling(4, 2)
    scaling.set_var_weights_from_nominal([3.0, 10.0, 0.25, 1.0])
    scaling.obj_weight = 4
    scaling.set_cons_weights_from_nominal([25.0, 40.0])
    sp = ScaledProblem(problem, scaling)
    xs = sp.scale_point(x0)
    np.testing.assert_array_equal(np.asarray(sp.unscale_point(xs)), np.asarray(x0))


def test_scaled_derivative_consistency():
    """Scaled gradients/Jacobians equal AD of the scaled objective."""
    problem, x0, _ = hs71_problem()
    scaling = Scaling(4, 2, obj_weight=2)
    scaling.set_var_weights_from_nominal([2.0, 4.0, 4.0, 2.0])
    scaling.set_cons_weights_from_nominal([16.0, 32.0])
    sp = ScaledProblem(problem, scaling)
    xs = sp.scale_point(x0)

    import jax

    g_direct = jax.grad(sp.obj_val)(xs)
    np.testing.assert_allclose(
        np.asarray(sp.obj_grad(xs)), np.asarray(g_direct), rtol=1e-12
    )
    J_direct = jax.jacfwd(sp.cons_val)(xs)
    np.testing.assert_allclose(
        np.asarray(sp.cons_jac(xs)), np.asarray(J_direct), rtol=1e-12
    )


def test_scaled_hess_prod_consistency():
    problem, x0, _ = hs71_problem()
    scaling = Scaling(4, 2, obj_weight=-1)
    scaling.set_var_weights_from_nominal([2.0, 4.0, 4.0, 2.0])
    scaling.set_cons_weights_from_nominal([16.0, 32.0])
    sp = ScaledProblem(problem, scaling)
    xs = sp.scale_point(x0)

    import jax

    mu = jnp.array([0.5, -0.25])

    def lag(z):
        return sp.obj_val(z) + jnp.vdot(mu, sp.cons_val(z))

    H = jax.hessian(lag)(xs)
    d = jnp.array([1.0, -1.0, 0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(sp.hess_prod(xs, d, mu)), np.asarray(H @ d), rtol=1e-10
    )


def test_solve_scaled_hs71():
    """Solving the scaled problem gives the same solution after unscaling."""
    problem, x0, x_opt = hs71_problem()
    scaling = Scaling(4, 2)
    scaling.obj_weight = 3
    scaling.set_var_weights_from_nominal([2.0, 4.0, 4.0, 2.0])
    scaling.set_cons_weights_from_nominal([32.0, 64.0])
    sp = ScaledProblem(problem, scaling)

    state = solve(sp, Settings(), sp.scale_point(x0), max_iterations=200)
    assert int(state.status) == Status.OPTIMAL
    x = np.asarray(sp.unscale_point(state.it.x))
    np.testing.assert_allclose(x, x_opt, atol=1e-4)
    # unscaled duals satisfy original stationarity
    it0 = create_iterate(problem, jnp.asarray(x))
    mu = np.asarray(sp.unscale_cons_dual(state.it.cons_dual))
    nu = np.asarray(sp.unscale_vars_dual(state.it.vars_dual))
    resid = (
        np.asarray(it0.obj_grad)
        + np.asarray(it0.cons_jac).T @ mu
        + nu
    )
    assert np.max(np.abs(resid)) < 1e-4


def test_derive_weights():
    problem, x0, _ = rosenbrock_problem()
    it = create_iterate(problem, x0)
    scaling = Scaling(2, 0)
    scaling.derive_obj_weight_from_grad(it.obj_grad)
    sp = ScaledProblem(problem, scaling)
    g = np.asarray(sp.obj_grad(sp.scale_point(x0)))
    assert 0.25 <= np.max(np.abs(g)) <= 2.5


def test_solver_chain_composes_scaling():
    """Solver(problem, x0, scaling=...) mirrors the reference chain
    scaling -> preprocessing -> problem_solver (solver.c:278) with
    auto-unscaled solution, duals, objective and residuals
    (solver/solve.c:270, problem_scaling_test.c)."""
    from sleqp_tpu.solver import Solver

    problem, x0, x_opt = hs71_problem()
    f_opt = 17.0140172
    scaling = Scaling(problem.num_variables, problem.num_cons)
    scaling.obj_weight = 3
    scaling.var_weights = np.array([1, -1, 2, 0], dtype=np.int32)
    scaling.cons_weights = np.array([-2, 1], dtype=np.int32)

    solver = Solver(problem, x0, scaling=scaling)
    status = solver.solve(max_iterations=100)
    assert status == Status.OPTIMAL

    # solution/objective are reported in ORIGINAL space
    assert abs(solver.obj_val - f_opt) <= 1e-5 * (1.0 + abs(f_opt))
    x = solver.solution
    np.testing.assert_allclose(x, x_opt, atol=1e-4)

    # residuals checked in UNSCALED space (problem_scaling_test.c)
    feas, slack, stat = solver.residuals(original=True)
    assert feas <= 1e-6
    assert slack <= 1e-6
    assert stat <= 1e-5

    # duals are unscaled: stationarity of the original Lagrangian holds
    it = solver.iterate
    g = np.asarray(problem.obj_grad(it.x))
    J = np.asarray(problem.cons_jac(it.x))
    r = g + J.T @ np.asarray(it.cons_dual) + np.asarray(it.vars_dual)
    assert np.max(np.abs(r)) <= 1e-5


def test_solver_chain_auto_scaling():
    """scaling='auto' derives weights from derivatives at x0
    (scale.c:640-740) and still converges on a badly scaled problem."""
    from sleqp_tpu import Func, Problem
    from sleqp_tpu.solver import Solver

    # objective with a 2^12 scale mismatch between variables
    def obj(x):
        return 4096.0 * (x[0] - 1.0) ** 2 + (x[1] - 4096.0) ** 2 / 4096.0

    def cons(x):
        return jnp.array([4096.0 * x[0] + x[1] / 4096.0])

    func = Func(obj, num_variables=2, cons=cons, num_cons=1)
    problem = Problem(
        func,
        general_lb=jnp.array([4097.0]),
        general_ub=jnp.array([jnp.inf]),
    )
    x0 = jnp.array([2.0, 2000.0])
    solver = Solver(problem, x0, scaling="auto")
    assert solver.scaling is not None
    assert int(np.max(np.abs(solver.scaling.cons_weights))) > 0
    status = solver.solve(max_iterations=200)
    assert status == Status.OPTIMAL
    feas, slack, stat = solver.residuals(original=True)
    assert feas <= 1e-6 * 4097.0  # feasibility scale of the original row
    assert stat <= 1e-4
