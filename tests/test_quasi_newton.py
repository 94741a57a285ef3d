"""Quasi-Newton tests: secant property, PSD-ness, end-to-end solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu import HessEval, Settings, Status
from sleqp_tpu.problem_solver import solve
from sleqp_tpu.quasi_newton import (
    bfgs_product,
    bfgs_push,
    qn_init,
    sr1_product,
    sr1_push,
)

from fixtures import hs71_problem, quadfunc_problem, rosenbrock_problem


def _push_pairs(qn, pairs, method):
    for s, y in pairs:
        s = jnp.asarray(s)
        y = jnp.asarray(y)
        if method == "bfgs":
            qn = bfgs_push(qn, s, y, damped=True, sizing=False)
        else:
            qn = sr1_push(qn, s, y)
    return qn


def test_bfgs_secant_property():
    """After pushing (s, y) with s'y > 0, B s == y (undamped case)."""
    rng = np.random.default_rng(0)
    n = 5
    qn = qn_init(n, 4, jnp.float64)
    s = rng.standard_normal(n)
    y = s + 0.5 * rng.standard_normal(n)
    if float(np.dot(s, y)) < 0:
        y = -y
    qn = _push_pairs(qn, [(s, y)], "bfgs")
    Bs = bfgs_product(qn, jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(Bs), y, atol=1e-10)


def test_bfgs_quadratic_reconstruction():
    """On a quadratic, n independent pairs recover H exactly (s^T H s > 0)."""
    rng = np.random.default_rng(1)
    n = 4
    M = rng.standard_normal((n, n))
    H = M @ M.T + n * np.eye(n)
    qn = qn_init(n, n, jnp.float64)
    pairs = []
    for _ in range(n):
        s = rng.standard_normal(n)
        pairs.append((s, H @ s))
    qn = _push_pairs(qn, pairs, "bfgs")
    # newest secant pair must hold exactly
    s_last, y_last = pairs[-1]
    np.testing.assert_allclose(
        np.asarray(bfgs_product(qn, jnp.asarray(s_last))), y_last, atol=1e-8
    )


def test_bfgs_positive_definite():
    rng = np.random.default_rng(2)
    n = 6
    qn = qn_init(n, 5, jnp.float64)
    pairs = []
    for _ in range(8):  # exceed the window: ring buffer rolls
        s = rng.standard_normal(n)
        y = rng.standard_normal(n)
        if np.dot(s, y) < 0:
            y = -y  # indefinite data; damping keeps B PSD
        pairs.append((s, y))
    qn = _push_pairs(qn, pairs, "bfgs")
    for _ in range(10):
        d = rng.standard_normal(n)
        curvature = float(jnp.vdot(jnp.asarray(d), bfgs_product(qn, jnp.asarray(d))))
        assert curvature > 0


def test_sr1_secant_property():
    rng = np.random.default_rng(3)
    n = 5
    qn = qn_init(n, 4, jnp.float64)
    s = rng.standard_normal(n)
    y = rng.standard_normal(n)
    qn = _push_pairs(qn, [(s, y)], "sr1")
    Bs = sr1_product(qn, jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(Bs), y, atol=1e-10)


@pytest.mark.parametrize(
    "hess_eval", [HessEval.DAMPED_BFGS, HessEval.SR1, HessEval.SIMPLE_BFGS]
)
def test_solve_rosenbrock_quasi_newton(hess_eval):
    problem, x0, x_opt = rosenbrock_problem()
    settings = Settings(hess_eval=hess_eval)
    state = solve(problem, settings, x0, max_iterations=300)
    assert int(state.status) == Status.OPTIMAL, (
        f"{hess_eval.name}: status {Status(int(state.status)).name}, "
        f"it {int(state.iteration)} stat {float(state.stat_res):.2e}"
    )
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=1e-5)


def test_solve_hs71_bfgs():
    problem, x0, x_opt = hs71_problem()
    settings = Settings(hess_eval=HessEval.DAMPED_BFGS)
    state = solve(problem, settings, x0, max_iterations=300)
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=1e-4)


def test_block_diagonal_hess_struct():
    """Per-block BFGS with a declared block-diagonal Hessian
    (reference SleqpHessStruct + bfgs.c blocks)."""
    import jax.numpy as jnp
    from sleqp_tpu import Func, Problem

    # separable objective: two independent 2-d Rosenbrocks
    def obj(x):
        return (
            (1.0 - x[0]) ** 2
            + 100.0 * (x[1] - x[0] ** 2) ** 2
            + (1.0 - x[2]) ** 2
            + 10.0 * (x[3] - x[2] ** 2) ** 2
        )

    func = Func(obj, num_variables=4, hess_struct=((0, 2), (2, 4)))
    problem = Problem(func)
    settings = Settings(hess_eval=HessEval.DAMPED_BFGS)
    state = solve(problem, settings, jnp.zeros(4), max_iterations=300)
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(
        np.asarray(state.it.x), [1.0, 1.0, 1.0, 1.0], atol=1e-5
    )
    # state holds one ring buffer per block
    assert isinstance(state.qn, tuple) and len(state.qn) == 2
    assert state.qn[0].S.shape == (5, 2)


def test_invalid_hess_struct():
    import jax.numpy as jnp
    from sleqp_tpu import Func

    with pytest.raises(ValueError):
        Func(lambda x: jnp.vdot(x, x), num_variables=3, hess_struct=((0, 2), (1, 3)))
