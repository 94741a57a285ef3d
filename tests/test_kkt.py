"""Tests for the masked KKT solves and the Steihaug projected CG."""

import jax
import jax.numpy as jnp
import numpy as np

from sleqp_tpu.ops.kkt import (
    aug_jac_create,
    project_nullspace,
    solve_lsq,
    solve_min_norm,
)
from sleqp_tpu.ops.tr_cg import steihaug_cg
from sleqp_tpu.types import ActiveState


def _random_system(seed=0, n=6, m=3, n_active_vars=1, n_active_cons=2):
    rng = np.random.default_rng(seed)
    J = jnp.asarray(rng.standard_normal((m, n)))
    var_states = np.zeros(n, dtype=np.int8)
    var_states[:n_active_vars] = ActiveState.ACTIVE_LOWER
    cons_states = np.zeros(m, dtype=np.int8)
    cons_states[:n_active_cons] = ActiveState.ACTIVE_UPPER
    return J, jnp.asarray(var_states), jnp.asarray(cons_states)


def _dense_active_rows(J, var_states, cons_states):
    n = J.shape[1]
    A = np.vstack([np.eye(n), np.asarray(J)])
    states = np.concatenate([np.asarray(var_states), np.asarray(cons_states)])
    return A[states != 0], states != 0


def test_min_norm_solution():
    J, vs, cs = _random_system()
    aj = aug_jac_create(J, vs, cs)
    rhs = jnp.asarray(np.random.default_rng(1).standard_normal(6 + 3))
    x = solve_min_norm(aj, rhs)

    A_w, active = _dense_active_rows(J, vs, cs)
    rhs_w = np.asarray(rhs)[active]
    # constraint satisfaction
    np.testing.assert_allclose(A_w @ np.asarray(x), rhs_w, atol=1e-10)
    # min-norm: x should equal A_w^T (A_w A_w^T)^-1 rhs_w
    expected = A_w.T @ np.linalg.solve(A_w @ A_w.T, rhs_w)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-10)


def test_lsq_duals_and_projection():
    J, vs, cs = _random_system()
    aj = aug_jac_create(J, vs, cs)
    g = jnp.asarray(np.random.default_rng(2).standard_normal(6))
    x, lam = solve_lsq(aj, g)

    A_w, active = _dense_active_rows(J, vs, cs)
    lam_w, *_ = np.linalg.lstsq(A_w.T, np.asarray(g), rcond=None)
    np.testing.assert_allclose(np.asarray(lam)[active], lam_w, atol=1e-10)
    # inactive duals exactly zero
    np.testing.assert_allclose(np.asarray(lam)[~active], 0.0, atol=1e-12)
    # x is the orthogonal projection onto null(A_w)
    np.testing.assert_allclose(A_w @ np.asarray(x), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(g) - A_w.T @ lam_w, atol=1e-10
    )


def test_empty_working_set():
    J, _, _ = _random_system()
    vs = jnp.zeros(6, dtype=jnp.int8)
    cs = jnp.zeros(3, dtype=jnp.int8)
    aj = aug_jac_create(J, vs, cs)
    v = jnp.arange(6.0)
    np.testing.assert_allclose(
        np.asarray(project_nullspace(aj, v)), np.arange(6.0), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(solve_min_norm(aj, jnp.ones(9))), 0.0, atol=1e-12
    )


def test_cg_interior_solution():
    """Convex quadratic, working set empty, big radius -> Newton point."""
    rng = np.random.default_rng(3)
    n = 5
    M = rng.standard_normal((n, n))
    H = jnp.asarray(M @ M.T + n * np.eye(n))
    g = jnp.asarray(rng.standard_normal(n))
    J = jnp.zeros((0, n))
    aj = aug_jac_create(J, jnp.zeros(n, dtype=jnp.int8), jnp.zeros(0, dtype=jnp.int8))

    res = steihaug_cg(lambda d: H @ d, aj, g, radius=1e3, max_iterations=50)
    expected = -np.linalg.solve(np.asarray(H), np.asarray(g))
    np.testing.assert_allclose(np.asarray(res.step), expected, atol=1e-8)
    assert not bool(res.on_boundary)


def test_cg_respects_constraints():
    """Minimizer restricted to null(A_W)."""
    rng = np.random.default_rng(4)
    n, m = 6, 2
    M = rng.standard_normal((n, n))
    H = jnp.asarray(M @ M.T + n * np.eye(n))
    g = jnp.asarray(rng.standard_normal(n))
    J = jnp.asarray(rng.standard_normal((m, n)))
    cs = jnp.asarray(np.array([1, 2], dtype=np.int8))
    aj = aug_jac_create(J, jnp.zeros(n, dtype=jnp.int8), cs)

    res = steihaug_cg(lambda d: H @ d, aj, g, radius=1e3, max_iterations=100)
    d = np.asarray(res.step)
    np.testing.assert_allclose(np.asarray(J) @ d, 0.0, atol=1e-8)

    # KKT of the reduced problem: Z^T (H d + g) = 0 for nullspace basis Z
    from scipy.linalg import null_space

    Z = null_space(np.asarray(J))
    np.testing.assert_allclose(
        Z.T @ (np.asarray(H) @ d + np.asarray(g)), 0.0, atol=1e-7
    )


def test_cg_boundary_on_negative_curvature():
    H = jnp.asarray(np.diag([-2.0, 1.0]))
    g = jnp.asarray([1.0, 0.0])
    aj = aug_jac_create(
        jnp.zeros((0, 2)), jnp.zeros(2, dtype=jnp.int8), jnp.zeros(0, dtype=jnp.int8)
    )
    res = steihaug_cg(lambda d: H @ d, aj, g, radius=1.0, max_iterations=50)
    assert bool(res.on_boundary)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(res.step)), 1.0, atol=1e-10)
    assert float(res.min_rayleigh) < 0


def test_cg_trust_region_crossing():
    H = jnp.asarray(np.eye(2))
    g = jnp.asarray([10.0, 0.0])
    aj = aug_jac_create(
        jnp.zeros((0, 2)), jnp.zeros(2, dtype=jnp.int8), jnp.zeros(0, dtype=jnp.int8)
    )
    res = steihaug_cg(lambda d: H @ d, aj, g, radius=1.0, max_iterations=50)
    assert bool(res.on_boundary)
    np.testing.assert_allclose(np.asarray(res.step), [-1.0, 0.0], atol=1e-10)


def test_cg_jittable_and_vmappable():
    n = 4

    def solve(gvec):
        H = jnp.eye(n) * 2.0
        aj = aug_jac_create(
            jnp.zeros((0, n)),
            jnp.zeros(n, dtype=jnp.int8),
            jnp.zeros(0, dtype=jnp.int8),
        )
        return steihaug_cg(lambda d: H @ d, aj, gvec, 100.0, 20).step

    gs = jnp.asarray(np.random.default_rng(5).standard_normal((3, n)))
    batched = jax.jit(jax.vmap(solve))(gs)
    np.testing.assert_allclose(np.asarray(batched), -np.asarray(gs) / 2.0, atol=1e-9)
