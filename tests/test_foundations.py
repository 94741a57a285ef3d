"""Tests for the foundation layers: settings, problem model, iterate, merit."""

import jax.numpy as jnp
import numpy as np
import pytest

import sleqp_tpu
from sleqp_tpu import (
    Settings,
    create_iterate,
    merit_func,
    merit_linear,
    merit_quadratic,
    read_settings_string,
)
from sleqp_tpu.iterate import (
    kkt_residuals,
    total_violation,
    violated_cons_multipliers,
)
from sleqp_tpu.merit import make_direction

from fixtures import hs71_problem, rosenbrock_problem, wachbieg_problem


def test_settings_defaults():
    s = Settings()
    assert s.feas_tol == 1e-6
    assert s.cauchy_tau == 0.5
    assert s.accepted_reduction == 1e-8
    assert s.perform_soc


def test_settings_file_reader():
    s = read_settings_string(
        """
        # comment
        feas_tol = 1e-8
        perform_soc = false
        linesearch = EXACT
        num_quasi_newton_iterates = 10
        """
    )
    assert s.feas_tol == 1e-8
    assert not s.perform_soc
    assert s.linesearch == sleqp_tpu.Linesearch.EXACT
    assert s.num_quasi_newton_iterates == 10


def test_settings_unknown_key():
    with pytest.raises(ValueError):
        read_settings_string("no_such_setting = 1")


def test_problem_eval_hs71():
    problem, x0, _ = hs71_problem()
    f = problem.obj_val(x0)
    np.testing.assert_allclose(float(f), 1 * 1 * (1 + 5 + 5) + 5)
    c = problem.cons_val(x0)
    np.testing.assert_allclose(np.asarray(c), [25.0, 52.0])
    J = problem.cons_jac(x0)
    assert J.shape == (2, 4)
    # AD Jacobian row 0 of x0*x1*x2*x3 at (1,5,5,1) = [25, 5, 5, 25]
    np.testing.assert_allclose(np.asarray(J[0]), [25.0, 5.0, 5.0, 25.0])


def test_hess_prod_matches_dense_hessian():
    problem, x0, _ = hs71_problem()
    import jax

    mu = jnp.array([0.3, -0.7])

    def lag(x):
        return problem.obj_val(x) + jnp.vdot(mu, problem.cons_val(x))

    H = jax.hessian(lag)(x0)
    d = jnp.array([1.0, -2.0, 0.5, 3.0])
    hd = problem.hess_prod(x0, d, mu)
    np.testing.assert_allclose(np.asarray(hd), np.asarray(H @ d), rtol=1e-12)


def test_iterate_and_residuals():
    problem, x0, _ = wachbieg_problem()
    it = create_iterate(problem, x0)
    feas, slack, stat = kkt_residuals(problem.data, it)
    # c(-2,1,1) = (4-1-1, -2-1-0.5) = (2, -3.5); equality cons -> viol 3.5
    np.testing.assert_allclose(float(feas), 3.5)
    # zero duals -> slackness 0, stationarity = |grad| inf-norm = 1
    np.testing.assert_allclose(float(slack), 0.0)
    np.testing.assert_allclose(float(stat), 1.0)


def test_violated_multipliers():
    problem, x0, _ = wachbieg_problem()
    c = problem.cons_val(x0)
    mult = violated_cons_multipliers(problem.data, c)
    np.testing.assert_allclose(np.asarray(mult), [1.0, -1.0])


def test_merit_models_consistent():
    problem, x0, _ = hs71_problem()
    it = create_iterate(problem, x0)
    penalty = jnp.asarray(10.0)

    phi = merit_func(problem.data, it, penalty)
    # HS71 at start: c = (25, 52): cons 0 satisfied, cons 1 violated by 12
    np.testing.assert_allclose(float(phi), float(it.obj_val) + 10.0 * 12.0)

    d = jnp.array([0.1, -0.2, 0.05, 0.3])
    hd = problem.hess_prod(x0, d, it.cons_dual)
    direction = make_direction(it, d, hd)

    lin = merit_linear(problem.data, it, direction, penalty)
    quad = merit_quadratic(problem.data, it, direction, penalty)
    np.testing.assert_allclose(
        float(quad),
        float(lin) + 0.5 * float(jnp.vdot(d, hd)),
        rtol=1e-12,
    )

    # zero direction: linear model == exact merit
    zero_dir = make_direction(it, jnp.zeros(4), jnp.zeros(4))
    np.testing.assert_allclose(
        float(merit_linear(problem.data, it, zero_dir, penalty)), float(phi)
    )


def test_total_violation_box_clip():
    problem, x0, _ = rosenbrock_problem()
    it = create_iterate(problem, jnp.array([5.0, -3.0]))
    assert float(total_violation(problem.data, it.cons_val)) == 0.0
