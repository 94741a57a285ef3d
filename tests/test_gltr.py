"""GLTR trust-region solver tests (replacement for trlib, tr/trlib_solver.c).

Solutions are validated against brute-force More-Sorensen on the dense
Hessian: for the TR problem the optimum satisfies
(H + lam I) d = -g with lam >= 0, H + lam I PSD, lam (||d|| - r) = 0.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu.ops.gltr import gltr
from sleqp_tpu.ops.kkt import aug_jac_create
from sleqp_tpu.types import ActiveState


def _dense_tr_solution(H, g, radius):
    """Reference TR solution by eigendecomposition."""
    w, Q = np.linalg.eigh(H)
    gq = Q.T @ g

    def norm_at(lam):
        denom = w + lam
        return np.linalg.norm(gq / denom)

    # interior?
    if w[0] > 0 and norm_at(0.0) <= radius:
        return -np.linalg.solve(H, g)
    lo = max(0.0, -w[0]) + 1e-14
    hi = lo + max(1.0, np.linalg.norm(g) / radius)
    while norm_at(hi) > radius:
        hi *= 2
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if norm_at(mid) > radius:
            lo = mid
        else:
            hi = mid
    lam = 0.5 * (lo + hi)
    return Q @ (-(gq / (w + lam)))


def _empty_aug_jac(n):
    return aug_jac_create(
        jnp.zeros((0, n)), jnp.zeros(n, dtype=jnp.int8), jnp.zeros(0, dtype=jnp.int8)
    )


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("radius", [0.1, 1.0, 100.0])
def test_gltr_vs_dense_convex(seed, radius):
    rng = np.random.default_rng(seed)
    n = 8
    M = rng.standard_normal((n, n))
    H = M @ M.T + 0.5 * np.eye(n)
    g = rng.standard_normal(n)

    res = gltr(
        lambda d: jnp.asarray(H) @ d,
        _empty_aug_jac(n),
        jnp.asarray(g),
        radius,
        max_iterations=50,
    )
    expected = _dense_tr_solution(H, g, radius)
    np.testing.assert_allclose(np.asarray(res.step), expected, atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_gltr_vs_dense_indefinite(seed):
    """Indefinite Hessians: GLTR must follow negative curvature to the
    boundary (Steihaug would stop early)."""
    rng = np.random.default_rng(100 + seed)
    n = 8
    M = rng.standard_normal((n, n))
    H = 0.5 * (M + M.T)  # indefinite
    g = rng.standard_normal(n)
    radius = 1.0

    res = gltr(
        lambda d: jnp.asarray(H) @ d,
        _empty_aug_jac(n),
        jnp.asarray(g),
        radius,
        max_iterations=60,
    )
    d = np.asarray(res.step)
    expected = _dense_tr_solution(H, g, radius)
    obj = g @ d + 0.5 * d @ H @ d
    obj_exp = g @ expected + 0.5 * expected @ H @ expected
    # same objective value (solution may be non-unique)
    assert obj <= obj_exp + 1e-6 * (1 + abs(obj_exp))
    assert np.linalg.norm(d) <= radius + 1e-9
    assert bool(res.on_boundary)


def test_gltr_projected():
    """With an active working set the step stays in null(A_W)."""
    rng = np.random.default_rng(7)
    n, m = 6, 2
    M = rng.standard_normal((n, n))
    H = M @ M.T + np.eye(n)
    g = rng.standard_normal(n)
    J = rng.standard_normal((m, n))
    aj = aug_jac_create(
        jnp.asarray(J),
        jnp.zeros(n, dtype=jnp.int8),
        jnp.full((m,), ActiveState.ACTIVE_UPPER, dtype=jnp.int8),
    )
    res = gltr(
        lambda d: jnp.asarray(H) @ d, aj, jnp.asarray(g), 1e3, max_iterations=50
    )
    d = np.asarray(res.step)
    np.testing.assert_allclose(J @ d, 0.0, atol=1e-8)

    from scipy.linalg import null_space

    Z = null_space(J)
    np.testing.assert_allclose(Z.T @ (H @ d + g), 0.0, atol=1e-6)


def test_gltr_zero_gradient():
    n = 4
    res = gltr(
        lambda d: d, _empty_aug_jac(n), jnp.zeros(n), 1.0, max_iterations=10
    )
    np.testing.assert_allclose(np.asarray(res.step), 0.0)


def test_solver_with_gltr():
    from sleqp_tpu import Settings, Status, TRSolver
    from sleqp_tpu.problem_solver import solve
    from fixtures import hs71_problem, rosenbrock_problem

    for make in (rosenbrock_problem, hs71_problem):
        problem, x0, x_opt = make()
        state = solve(
            problem, Settings(tr_solver=TRSolver.GLTR), x0, max_iterations=200
        )
        assert int(state.status) == Status.OPTIMAL, make.__name__
        np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=2e-5)
