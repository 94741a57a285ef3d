"""Block-tridiagonal solver tests vs dense assembly."""

import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu.ops.block_tridiag import (
    block_tridiag_solve,
    schur_block_tridiag_solve,
)


def _random_spd_block_tridiag(N, k, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.standard_normal((N - 1, k, k)) * 0.3
    D = np.zeros((N, k, k))
    for i in range(N):
        M = rng.standard_normal((k, k))
        D[i] = M @ M.T + (2.0 + 2 * k) * np.eye(k)
    b = rng.standard_normal((N, k))
    return jnp.asarray(D), jnp.asarray(L), jnp.asarray(b)


def _dense(D, L):
    N, k, _ = D.shape
    A = np.zeros((N * k, N * k))
    for i in range(N):
        A[i * k : (i + 1) * k, i * k : (i + 1) * k] = D[i]
    for i in range(N - 1):
        A[(i + 1) * k : (i + 2) * k, i * k : (i + 1) * k] = L[i]
        A[i * k : (i + 1) * k, (i + 1) * k : (i + 2) * k] = L[i].T
    return A


@pytest.mark.parametrize("N,k", [(5, 2), (11, 3), (16, 4)])
def test_thomas_vs_dense(N, k):
    D, L, b = _random_spd_block_tridiag(N, k)
    x = block_tridiag_solve(D, L, b)
    A = _dense(np.asarray(D), np.asarray(L))
    expected = np.linalg.solve(A, np.asarray(b).reshape(-1)).reshape(N, k)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-9)


@pytest.mark.parametrize("P", [2, 4])
@pytest.mark.parametrize("c", [3, 5])
def test_schur_vs_dense(P, c):
    N = P * c - 1
    k = 3
    D, L, b = _random_spd_block_tridiag(N, k, seed=P * 10 + c)
    x = schur_block_tridiag_solve(D, L, b, num_chunks=P)
    A = _dense(np.asarray(D), np.asarray(L))
    expected = np.linalg.solve(A, np.asarray(b).reshape(-1)).reshape(N, k)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-8)


def test_schur_matches_thomas_large():
    N, k, P = 63, 4, 8
    D, L, b = _random_spd_block_tridiag(N, k, seed=42)
    x1 = block_tridiag_solve(D, L, b)
    x2 = schur_block_tridiag_solve(D, L, b, num_chunks=P)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-8)


def test_multiple_rhs():
    D, L, b = _random_spd_block_tridiag(7, 2, seed=3)
    B = jnp.stack([b, 2.0 * b], axis=-1)  # (N, k, 2)
    X = block_tridiag_solve(D, L, B)
    np.testing.assert_allclose(
        np.asarray(X[..., 1]), 2.0 * np.asarray(X[..., 0]), atol=1e-10
    )


def test_schur_factor_resolve_split():
    """Factor-once/solve-many SPIKE split must match the direct solve
    for repeated right-hand sides (fact_types.h:9-33 split)."""
    import numpy as np

    from sleqp_tpu.ops.block_tridiag import (
        block_tridiag_solve,
        schur_factor,
        schur_resolve,
    )

    N, k, P = 15, 3, 4  # N+1 = 16 = P*c with c=4
    rng = np.random.default_rng(0)
    M = rng.standard_normal((N, k, k))
    D = jnp.asarray(np.einsum("nij,nkj->nik", M, M) + 2 * k * np.eye(k))
    L = jnp.asarray(rng.standard_normal((N - 1, k, k)) * 0.3)
    fact = schur_factor(D, L, P)
    for seed in range(3):
        b = jnp.asarray(np.random.default_rng(seed).standard_normal((N, k)))
        np.testing.assert_allclose(
            np.asarray(schur_resolve(fact, b)),
            np.asarray(block_tridiag_solve(D, L, b)),
            atol=1e-10,
        )
    # multi-rhs
    B = jnp.asarray(rng.standard_normal((N, k, 2)))
    np.testing.assert_allclose(
        np.asarray(schur_resolve(fact, B)),
        np.asarray(block_tridiag_solve(D, L, B)),
        atol=1e-10,
    )


def test_solve_mp_spike32_backend():
    """spike32 mixed-precision backend (f32 SPIKE + f64 refinement) must
    reach f64 accuracy, including with identity padding (N+1 not a
    multiple of the chunk count)."""
    import numpy as np

    from sleqp_tpu.ops.block_tridiag import block_tridiag_solve
    from sleqp_tpu.ops.pallas_tridiag import block_tridiag_solve_mp

    for N in (18, 37):  # exercises pad != 0
        k = 4
        rng = np.random.default_rng(N)
        M = rng.standard_normal((N, k, k))
        D = jnp.asarray(np.einsum("nij,nkj->nik", M, M) + 2 * k * np.eye(k))
        L = jnp.asarray(rng.standard_normal((N - 1, k, k)) * 0.5)
        b = jnp.asarray(rng.standard_normal((N, k)))
        x = block_tridiag_solve_mp(D, L, b, refine_iters=3, backend="spike32")
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(block_tridiag_solve(D, L, b)), atol=1e-9
        )
