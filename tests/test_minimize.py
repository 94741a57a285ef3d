"""Tests for the scipy-style minimize front end.

Mirrors the reference python binding tests (bindings/python/tests/):
HS-style constrained problems, numpy (host) callables with finite
differences, bounds, linear constraints, callbacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import Bounds, LinearConstraint, NonlinearConstraint

from sleqp_tpu.minimize import minimize


def test_unconstrained_rosenbrock_jax():
    def fun(x):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = minimize(fun, np.zeros(2))
    assert res.success
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)
    assert res.nit > 0


def test_unconstrained_numpy_findiff():
    """Pure-numpy objective exercises the pure_callback + findiff path."""

    def fun(x):
        x = np.asarray(x)
        return float((1.0 - x[0]) ** 2 + 10.0 * (x[1] - x[0] ** 2) ** 2)

    res = minimize(fun, np.zeros(2))
    assert res.success
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-4)


def test_numpy_with_jac():
    def fun(x):
        return float(np.sum(np.asarray(x) ** 2))

    def jac(x):
        return 2.0 * np.asarray(x)

    res = minimize(fun, np.array([3.0, -4.0]), jac=jac)
    assert res.success
    np.testing.assert_allclose(res.x, [0.0, 0.0], atol=1e-6)


def test_bounds_pairs():
    def fun(x):
        return (x[0] + 1.0) ** 2 + (x[1] - 2.0) ** 2

    res = minimize(fun, np.zeros(2), bounds=[(0, None), (None, 1.0)])
    assert res.success
    np.testing.assert_allclose(res.x, [0.0, 1.0], atol=1e-6)


def test_scipy_bounds_object():
    def fun(x):
        return jnp.vdot(x, x)

    res = minimize(fun, np.array([2.0, 2.0]), bounds=Bounds(1.0, 3.0))
    assert res.success
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)
    # bound duals reported with NLP sign convention (lower -> <= 0)
    assert np.all(res.mult_x <= 1e-10)


def test_dict_constraints_hs71_style():
    def fun(x):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]

    cons = [
        {"type": "ineq", "fun": lambda x: x[0] * x[1] * x[2] * x[3] - 25.0},
        {"type": "eq", "fun": lambda x: jnp.vdot(x, x) - 40.0},
    ]
    res = minimize(
        fun, np.array([1.0, 5.0, 5.0, 1.0]), bounds=[(1, 5)] * 4, constraints=cons
    )
    assert res.success
    np.testing.assert_allclose(
        res.x, [1.0, 4.742999, 3.821151, 1.379408], atol=1e-4
    )
    assert res.maxcv <= 1e-6


def test_linear_constraint():
    def fun(x):
        return -x[0] - 2.0 * x[1]

    res = minimize(
        fun,
        np.zeros(2),
        bounds=[(0, None), (0, None)],
        constraints=LinearConstraint(np.array([[1.0, 1.0]]), -np.inf, 1.0),
    )
    assert res.success
    np.testing.assert_allclose(res.x, [0.0, 1.0], atol=1e-8)


def test_nonlinear_constraint_object():
    def fun(x):
        return x[0] ** 2 + x[1] ** 2

    nlc = NonlinearConstraint(lambda x: x[0] + x[1], 1.0, np.inf)
    res = minimize(fun, np.array([2.0, 0.0]), constraints=nlc)
    assert res.success
    np.testing.assert_allclose(res.x, [0.5, 0.5], atol=1e-6)


def test_callback_and_abort():
    seen = []

    def fun(x):
        return jnp.vdot(x, x)

    def cb(xk):
        seen.append(np.array(xk))
        return len(seen) >= 1  # abort immediately

    res = minimize(fun, np.array([5.0, 5.0]), callback=cb)
    assert len(seen) >= 1


def test_unknown_option_raises():
    with pytest.raises(ValueError):
        minimize(lambda x: jnp.vdot(x, x), np.zeros(2), nonsense_option=3)


def test_maxiter_status():
    def fun(x):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = minimize(fun, np.zeros(2), maxiter=2)
    assert not res.success
    assert res.nit <= 2
