"""Pallas fused block-Thomas kernel vs the scan reference path.

Runs in interpreter mode on the CPU test backend; the compiled path is
identical modulo Mosaic lowering.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu.ops.block_tridiag import block_tridiag_solve
from sleqp_tpu.ops.pallas_tridiag import (
    block_tridiag_factor_solve_pallas,
    block_tridiag_matvec,
    block_tridiag_resolve_pallas,
    block_tridiag_solve_mp,
    pallas_supported,
)


def _random_spd_block_tridiag(N, k, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((N, k, k))
    D = D @ np.swapaxes(D, 1, 2) + (k + 2.0) * np.eye(k)
    L = 0.3 * rng.standard_normal((N - 1, k, k))
    b = rng.standard_normal((N, k))
    return (
        jnp.asarray(D, dtype),
        jnp.asarray(L, dtype),
        jnp.asarray(b, dtype),
    )


@pytest.mark.parametrize("N,k", [(5, 2), (9, 3), (16, 8)])
def test_factor_solve_matches_scan(N, k):
    D, L, b = _random_spd_block_tridiag(N, k, seed=N + k)
    x_ref = block_tridiag_solve(D, L, b)
    x32, Minv, Lp32 = block_tridiag_factor_solve_pallas(
        D, L, b, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(x32), np.asarray(x_ref), rtol=2e-4, atol=2e-4
    )
    assert Minv.shape == (N, k, k)
    assert Lp32.shape == (N, k, k)


def test_resolve_reuses_factorization():
    N, k = 7, 3
    D, L, b = _random_spd_block_tridiag(N, k, seed=11)
    _, Minv, Lp32 = block_tridiag_factor_solve_pallas(D, L, b, interpret=True)
    rng = np.random.default_rng(1)
    b2 = jnp.asarray(rng.standard_normal((N, k)))
    x2 = block_tridiag_resolve_pallas(Minv, Lp32, b2, interpret=True)
    x2_ref = block_tridiag_solve(D, L, b2)
    np.testing.assert_allclose(
        np.asarray(x2), np.asarray(x2_ref), rtol=2e-4, atol=2e-4
    )


def test_matvec_roundtrip():
    N, k = 6, 4
    D, L, b = _random_spd_block_tridiag(N, k, seed=5)
    x = block_tridiag_solve(D, L, b)
    np.testing.assert_allclose(
        np.asarray(block_tridiag_matvec(D, L, x)),
        np.asarray(b),
        rtol=1e-10,
        atol=1e-10,
    )


@pytest.mark.parametrize("rhs_cols", [None, 3])
def test_mixed_precision_refinement_reaches_f64(rhs_cols):
    N, k = 12, 4
    D, L, b = _random_spd_block_tridiag(N, k, seed=7)
    if rhs_cols is not None:
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.standard_normal((N, k, rhs_cols)))
    x = block_tridiag_solve_mp(D, L, b, refine_iters=3, interpret=True)
    assert x.dtype == jnp.float64
    resid = b - block_tridiag_matvec(D, L, x)
    scale = float(jnp.max(jnp.abs(b)))
    assert float(jnp.max(jnp.abs(resid))) <= 1e-10 * max(scale, 1.0)


def test_ocp_pallas_backend_matches_scan():
    """End-to-end: the structured SQP solve through the Pallas KKT kernel
    reaches the same KKT point as the scan path."""
    from sleqp_tpu import Status
    from sleqp_tpu.ocp import BlockStructuredProblem, ocp_solve

    H = 0.1

    def dynamics(x, u, t):
        pos, vel = x[0], x[1]
        acc = -jnp.sin(pos) - 0.1 * vel + u[0]
        return jnp.array([pos + H * vel, vel + H * acc])

    def stage_cost(x, u, t):
        return 0.5 * (jnp.vdot(x, x) + 0.1 * jnp.vdot(u, u))

    ocp = BlockStructuredProblem(
        dynamics,
        stage_cost,
        num_stages=8,
        num_states=2,
        num_controls=1,
        x0=jnp.array([1.0, 0.0]),
    )
    ref = ocp_solve(ocp, max_iterations=50)
    out = ocp_solve(ocp, max_iterations=50, tridiag_backend="pallas")
    assert int(out.status) == Status.OPTIMAL
    assert float(out.feas_res) <= 1e-6
    assert float(out.stat_res) <= 1e-6
    np.testing.assert_allclose(
        np.asarray(out.U), np.asarray(ref.U), rtol=1e-5, atol=1e-6
    )


def test_fallback_when_unsupported():
    # k beyond the GJ pivot-loop limit falls back to the scan path; the
    # streaming grid removed the old resident-N cap (large N supported)
    N, k = 4, 96
    D, L, b = _random_spd_block_tridiag(N, k, seed=9)
    assert not pallas_supported(N, k)
    assert pallas_supported(4096, 32)
    x = block_tridiag_solve_mp(D, L, b, interpret=True)
    x_ref = block_tridiag_solve(D, L, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-12)


def test_chol_pallas_backend_matches_f64():
    """Cholesky block-Thomas pallas kernels (stable per step, unlike the
    explicit-inverse kernel) must refine to f64 accuracy — including on
    the strongly-coupled condensed-KKT-like systems where the
    Gauss-Jordan kernel diverges."""
    import numpy as np

    from sleqp_tpu.ops.block_tridiag import block_tridiag_solve
    from sleqp_tpu.ops.pallas_tridiag import block_tridiag_solve_mp

    rng = np.random.default_rng(0)
    N, k = 12, 8
    M = rng.standard_normal((N, k, k))
    # strong off-diagonal coupling (the banded-K failure mode)
    D = jnp.asarray(
        np.einsum("nij,nkj->nik", M, M) * 0.1 + 1e4 * np.eye(k)
    )
    D = D.at[0].add(-1e4 * jnp.eye(k) + 2.0 * jnp.eye(k))
    L = jnp.asarray(rng.standard_normal((N - 1, k, k)) * 3e3)
    b = jnp.asarray(rng.standard_normal((N, k)))
    x = block_tridiag_solve_mp(D, L, b, refine_iters=3, backend="chol_pallas")
    ref = block_tridiag_solve(D, L, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=1e-7)


def test_batched_thomas_pallas_vs_xla():
    """The batched pallas factor/solve must match vmapped XLA
    block_thomas factor/solve (same recursion, same factor)."""
    import numpy as np

    from sleqp_tpu.ops.block_tridiag import (
        block_thomas_factor,
        block_thomas_solve,
    )
    from sleqp_tpu.ops.pallas_chol_tridiag import (
        batched_thomas_factor_pallas,
        batched_thomas_solve_pallas,
    )

    import jax

    P, c, k, r = 3, 5, 8, 4
    rng = np.random.default_rng(0)
    M = rng.standard_normal((P, c, k, k))
    D = jnp.asarray(
        np.einsum("pcij,pckj->pcik", M, M) + 2 * k * np.eye(k),
        dtype=jnp.float32,
    )
    L = jnp.asarray(
        rng.standard_normal((P, c - 1, k, k)) * 0.3, dtype=jnp.float32
    )
    chols, Lp = batched_thomas_factor_pallas(D, L)
    ch_ref = jax.vmap(block_thomas_factor)(D, L)
    np.testing.assert_allclose(
        np.asarray(chols), np.asarray(ch_ref), atol=1e-5
    )
    for B in (
        jnp.asarray(rng.standard_normal((P, c, k)), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal((P, c, k, r)), dtype=jnp.float32),
    ):
        x = batched_thomas_solve_pallas(chols, Lp, B)
        ref = jax.vmap(block_thomas_solve)(ch_ref, L, B)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(ref), atol=1e-5
        )


def test_spike32_tiny_n_identity_pads():
    """N=1 (single diagonal block) must not crash schur_factor: the
    chunk size clamps to c >= 2 with identity padding (ADVICE r4)."""
    for N, k in [(1, 3), (2, 2), (3, 4)]:
        D, L, b = _random_spd_block_tridiag(max(N, 2), k, seed=N * 7 + k)
        D, L, b = D[:N], L[: max(N - 1, 0)], b[:N]
        x = block_tridiag_solve_mp(D, L, b, backend="spike32", interpret=True)
        x_ref = block_tridiag_solve(D, L, b)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(x_ref), rtol=1e-9, atol=1e-9
        )


def test_unknown_backend_rejected():
    """Typos / wrong-namespace backend strings must raise, not silently
    route into the scan32 path (ADVICE r4)."""
    D, L, b = _random_spd_block_tridiag(5, 2, seed=3)
    with pytest.raises(ValueError, match="unknown"):
        block_tridiag_solve_mp(D, L, b, backend="spike")


def test_cyclic_reduction_matches_scan():
    """Pure CR and the CR+streaming-tail hybrid agree with the f64 scan
    on well-conditioned systems at f32 accuracy."""
    from sleqp_tpu.ops.cyclic_reduction import cr_factor, cr_resolve

    for N, k, tail in [(3, 2, 1), (12, 4, 1), (37, 8, 1), (50, 8, 16)]:
        D, L, b = _random_spd_block_tridiag(max(N, 2), k, seed=N + k)
        D, L, b = D[:N], L[: max(N - 1, 0)], b[:N]
        fact = cr_factor(D, L, interpret=True, tail_n=tail)
        x = cr_resolve(fact, b)
        ref = block_tridiag_solve(D, L, b)
        rel = float(
            jnp.max(jnp.abs(x - ref.astype(jnp.float32)))
            / jnp.max(jnp.abs(ref))
        )
        assert rel < 5e-6, (N, k, tail, rel)
        # multi-rhs resolve against the stored factorization
        rng = np.random.default_rng(1)
        B2 = jnp.asarray(rng.standard_normal((N, k, 3)), jnp.float32)
        x2 = cr_resolve(fact, B2)
        ref2 = block_tridiag_solve(D, L, B2.astype(jnp.float64))
        rel2 = float(
            jnp.max(jnp.abs(x2 - ref2.astype(jnp.float32)))
            / jnp.max(jnp.abs(ref2))
        )
        assert rel2 < 5e-6, (N, k, tail, rel2)


def test_cr32_mp_backend_refines_to_f64():
    """backend='cr32' (and the auto route to it) reaches f64 residuals
    through iterative refinement."""
    N, k = 24, 8
    D, L, b = _random_spd_block_tridiag(N, k, seed=5)
    for be in ("cr32", "auto"):
        x = block_tridiag_solve_mp(D, L, b, refine_iters=3, backend=be,
                                   interpret=True)
        assert x.dtype == jnp.float64
        resid = b - block_tridiag_matvec(D, L, x)
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(resid))) <= 1e-10 * max(scale, 1.0)


def test_batched_gj_inverse():
    from sleqp_tpu.ops.cyclic_reduction import batched_gj_inverse

    rng = np.random.default_rng(0)
    # k=64 exercises the blocked 2x2 Schur kernel path, k=32/16 the flat
    # one-hot sweep, k=3 the tiny/padding path
    for B, k in [(1, 4), (13, 3), (40, 16), (9, 32), (6, 64)]:
        C = rng.standard_normal((B, k, k))
        C = np.einsum("bij,bkj->bik", C, C) + 2 * k * np.eye(k)
        M = batched_gj_inverse(jnp.asarray(C), interpret=True)
        eye = np.einsum("bij,bjk->bik", np.asarray(M, np.float64), C)
        assert np.max(np.abs(eye - np.eye(k))) < 1e-4
