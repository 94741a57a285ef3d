"""Multi-device Schur-complement KKT solve on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sleqp_tpu.ops.block_tridiag import block_tridiag_solve
from sleqp_tpu.parallel.schur import sharded_schur_solve


def _random_spd(N, k, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.standard_normal((N - 1, k, k)) * 0.3
    D = np.zeros((N, k, k))
    for i in range(N):
        M = rng.standard_normal((k, k))
        D[i] = M @ M.T + (2.0 + 2 * k) * np.eye(k)
    b = rng.standard_normal((N, k))
    return jnp.asarray(D), jnp.asarray(L), jnp.asarray(b)


@pytest.mark.parametrize("c,k", [(4, 3), (8, 4)])
def test_sharded_matches_sequential(c, k):
    P = 8
    assert len(jax.devices()) >= P
    N = P * c - 1
    D, L, b = _random_spd(N, k, seed=c)
    mesh = Mesh(np.array(jax.devices()[:P]), axis_names=("chunks",))

    x_seq = block_tridiag_solve(D, L, b)
    x_par = sharded_schur_solve(D, L, b, mesh)
    np.testing.assert_allclose(np.asarray(x_par), np.asarray(x_seq), atol=1e-8)


def test_sharded_pallas_interiors_match_sequential():
    """Per-device interior elimination through the fused Pallas kernel
    (mixed-precision) reproduces the sequential float64 solution."""
    P, c, k = 8, 4, 3
    N = P * c - 1
    D, L, b = _random_spd(N, k, seed=17)
    mesh = Mesh(np.array(jax.devices()[:P]), axis_names=("chunks",))

    x_seq = block_tridiag_solve(D, L, b)
    x_par = sharded_schur_solve(D, L, b, mesh, tridiag_backend="pallas")
    np.testing.assert_allclose(np.asarray(x_par), np.asarray(x_seq), atol=1e-8)


def test_sharded_under_jit():
    P, c, k = 8, 6, 2
    N = P * c - 1
    D, L, b = _random_spd(N, k, seed=9)
    mesh = Mesh(np.array(jax.devices()[:P]), axis_names=("chunks",))

    solve = jax.jit(lambda D, L, b: sharded_schur_solve(D, L, b, mesh))
    x = solve(D, L, b)
    x_seq = block_tridiag_solve(D, L, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_seq), atol=1e-8)
