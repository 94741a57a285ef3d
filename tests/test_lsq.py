"""LSQ function + Gauss-Newton/LSQR tests (reference: gauss_newton_test.c,
rosenbrock_lsq_fixture.c, linear_lsq.c)."""

import jax.numpy as jnp
import numpy as np

from sleqp_tpu import Func, LSQFunc, Problem, Settings, Status, TRSolver
from sleqp_tpu.ops.lsqr import lsqr_tr
from sleqp_tpu.ops.kkt import aug_jac_create
from sleqp_tpu.problem_solver import solve

from fixtures import rosenbrock_lsq_problem


def test_lsqr_solves_least_squares():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((8, 5)))
    b = jnp.asarray(rng.standard_normal(8))
    d, iters = lsqr_tr(
        lambda v: A @ v, lambda u: A.T @ u, b, radius=1e3, n=5, max_iterations=50
    )
    expected, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(d), expected, atol=1e-8)


def test_lsqr_respects_radius():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((6, 4)))
    b = jnp.asarray(10.0 * rng.standard_normal(6))
    d, _ = lsqr_tr(
        lambda v: A @ v, lambda u: A.T @ u, b, radius=0.5, n=4, max_iterations=50
    )
    assert np.linalg.norm(np.asarray(d)) <= 0.5 + 1e-10


def test_rosenbrock_lsq_gauss_newton():
    problem, x0, x_opt = rosenbrock_lsq_problem()
    state = solve(problem, Settings(), x0, max_iterations=200)
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=1e-6)


def test_linear_lsq_one_shot():
    """Linear least squares solves in very few iterations."""
    rng = np.random.default_rng(2)
    A = rng.standard_normal((10, 4))
    b = rng.standard_normal(10)
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)

    func = LSQFunc(
        lambda x: Aj @ x - bj, num_variables=4, num_residuals=10
    )
    problem = Problem(func)
    state = solve(problem, Settings(), jnp.zeros(4), max_iterations=100)
    assert int(state.status) == Status.OPTIMAL
    expected, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(state.it.x), expected, atol=1e-6)


def test_constrained_lsq():
    """LSQ objective with a constraint goes through the GN system with
    penalty rows."""

    def residuals(x):
        return jnp.array([x[0] - 1.0, 10.0 * (x[1] - x[0] ** 2)])

    def cons(x):
        return jnp.array([x[0] + x[1]])

    func = LSQFunc(
        residuals, num_variables=2, num_residuals=2, cons=cons, num_cons=1
    )
    problem = Problem(func, general_lb=1.0, general_ub=1.0)
    state = solve(problem, Settings(), jnp.zeros(2), max_iterations=300)
    assert int(state.status) == Status.OPTIMAL
    x = np.asarray(state.it.x)
    np.testing.assert_allclose(x[0] + x[1], 1.0, atol=1e-7)


def test_lsq_with_cg_fallback():
    """tr_solver=CG forces the generic Newton path on LSQ funcs."""
    problem, x0, x_opt = rosenbrock_lsq_problem()
    state = solve(
        problem, Settings(tr_solver=TRSolver.CG), x0, max_iterations=200
    )
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=1e-6)
