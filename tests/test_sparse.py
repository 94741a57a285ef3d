"""Matrix-free general sparse path (sparse.py).

The route the reference covers with CSC assembly + sparse direct
factorization (aug_jac/standard_aug_jac.c, sparse/mat.c); here the
Jacobian is never materialized — jvp/vjp products + CG.  The large test
is the VERDICT r4 done-criterion: an UNSTRUCTURED sparse NLP at n = 5e4
(scattered long-range couplings no banded/OCP layout can express)
solved to 1e-6 with memory far below the dense O(n^2) Jacobian.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu import Settings, Status
from sleqp_tpu.sparse import SparseProblem, sparse_solve


def test_sparse_unconstrained_quadratic():
    n = 100
    tgt = jnp.arange(n, dtype=jnp.float64) / n

    p = SparseProblem(
        lambda x: jnp.sum((x - tgt) ** 2), num_variables=n
    )
    st = sparse_solve(p, Settings(), max_iterations=50)
    assert int(st.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(tgt), atol=1e-8)


def test_sparse_matches_dense_path_hs71():
    """Same NLP through the matrix-free path and the dense solver."""
    from sleqp_tpu.solver import Solver

    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import hs71_problem

    problem, x0, x_opt = hs71_problem()

    def obj(x):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]

    def cons(x):
        return jnp.array([x[0] * x[1] * x[2] * x[3], jnp.vdot(x, x)])

    p = SparseProblem(
        obj,
        num_variables=4,
        cons=cons,
        num_cons=2,
        var_lb=1.0,
        var_ub=5.0,
        cons_lb=jnp.array([25.0, 40.0]),
        cons_ub=jnp.array([jnp.inf, 40.0]),
        cauchy="pdlp",
    )
    st = sparse_solve(p, Settings(), x0=x0, max_iterations=100)
    assert int(st.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(st.x), x_opt, atol=1e-5)
    assert float(st.feas_res) <= 1e-6
    assert float(st.stat_res) <= 1e-6


def test_sparse_infeasible_detection():
    """Contradictory equality rows must certify local infeasibility via
    the restoration phase, not loop forever."""

    def cons(x):
        return jnp.array([x[0], x[0]])

    p = SparseProblem(
        lambda x: jnp.sum(x**2),
        num_variables=2,
        cons=cons,
        num_cons=2,
        cons_lb=jnp.array([0.0, 1.0]),
        cons_ub=jnp.array([0.0, 1.0]),
    )
    st = sparse_solve(p, Settings(), max_iterations=200)
    assert int(st.status) == Status.INFEASIBLE


def _scattered_problem(n, seed=3):
    """Unstructured sparse NLP: convex separable objective + long-range
    scattered difference constraints x[i_r] - x[j_r] in [-0.5, 0.5] with
    random index pairs (no banded or multistage layout applies)."""
    m = n // 10
    rng = np.random.default_rng(seed)
    i_idx = jnp.asarray(rng.integers(0, n, m))
    j_idx = jnp.asarray(rng.integers(0, n, m))
    w = jnp.asarray(rng.uniform(0.5, 1.5, n))
    tgt = jnp.asarray(rng.uniform(-2.0, 2.0, n))

    def obj(x):
        return 0.5 * jnp.sum(w * (x - tgt) ** 2)

    def cons(x):
        return x[i_idx] - x[j_idx]

    p = SparseProblem(
        obj,
        num_variables=n,
        cons=cons,
        num_cons=m,
        var_lb=-3.0,
        var_ub=3.0,
        cons_lb=-0.5,
        cons_ub=0.5,
    )
    return p, tgt


def test_sparse_scattered_medium():
    n = 2000
    p, tgt = _scattered_problem(n)
    st = sparse_solve(p, Settings(), max_iterations=100)
    assert int(st.status) == Status.OPTIMAL
    assert float(st.feas_res) <= 1e-6
    assert float(st.stat_res) <= 1e-6


@pytest.mark.slow
def test_sparse_scattered_50k():
    """VERDICT r4 #4 done-criterion: non-banded sparse problem at
    n = 5e4 to 1e-6 KKT residuals, memory << dense (a dense Jacobian
    alone would be 5000 x 50000 x 8B = 2 GB; this path stores only
    O(n + m) vectors)."""
    n = 50_000
    p, tgt = _scattered_problem(n)
    st = sparse_solve(p, Settings(), max_iterations=100)
    assert int(st.status) == Status.OPTIMAL
    assert float(st.feas_res) <= 1e-6
    assert float(st.stat_res) <= 1e-6
    # active rows carry sensible duals; inactive rows have zero duals
    lam = np.asarray(st.lam)
    act = np.asarray(st.act_low | st.act_up)
    assert np.all(lam[~act] == 0.0)


def test_sparse_mixed_precision():
    """compute_dtype='float32' routes the CG bulk through a float32
    operator with a float64 polish — same KKT tolerances."""
    n = 2000
    p, tgt = _scattered_problem(n)
    st = sparse_solve(
        p, Settings(compute_dtype="float32"), max_iterations=100
    )
    assert int(st.status) == Status.OPTIMAL
    assert float(st.feas_res) <= 1e-6
    assert float(st.stat_res) <= 1e-6
