"""Tests for the fixed-shape bounded-variable revised simplex.

Random LPs are cross-checked against scipy.optimize.linprog (HiGHS).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from sleqp_tpu.ops import simplex
from sleqp_tpu.types import INF, BaseStat


def _standard_form(A_rows, row_lb, row_ub, col_lb, col_ub, c):
    """Append logical columns (-I): rows become A_s x - w = 0."""
    m, n = A_rows.shape
    A = np.hstack([A_rows, -np.eye(m)])
    lb = np.concatenate([col_lb, row_lb])
    ub = np.concatenate([col_ub, row_ub])
    cc = np.concatenate([c, np.zeros(m)])
    return A, lb, ub, cc


def _slack_start(A_rows, col_lb, col_ub, row_lb, row_ub):
    """All structural at their finite bound nearest zero; logicals basic.

    Requires the resulting activity to fit the row bounds, which holds for
    the test LPs below (0 inside all row bounds at the chosen rest point).
    """
    m, n = A_rows.shape
    rest = np.where(
        np.abs(col_lb) <= np.abs(col_ub), col_lb, col_ub
    )
    rest = np.where(np.isfinite(rest), rest, 0.0)
    status = np.where(
        rest == col_lb, BaseStat.LOWER, BaseStat.UPPER
    ).astype(np.int8)
    status = np.where(
        ~np.isfinite(col_lb) & ~np.isfinite(col_ub), BaseStat.ZERO, status
    ).astype(np.int8)
    basis = n + np.arange(m, dtype=np.int32)
    status = np.concatenate(
        [status, np.full(m, BaseStat.BASIC, dtype=np.int8)]
    )
    return basis, status


def _solve_sleqp(A_rows, row_lb, row_ub, col_lb, col_ub, c, max_iter=500):
    A, lb, ub, cc = _standard_form(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    basis, status = _slack_start(A_rows, col_lb, col_ub, row_lb, row_ub)
    lb = np.where(np.isfinite(lb), lb, np.sign(lb) * INF)
    ub = np.where(np.isfinite(ub), ub, np.sign(ub) * INF)
    lb = np.where(lb == 0, 0.0, lb)
    ub = np.where(ub == 0, 0.0, ub)
    return simplex.solve(
        jnp.asarray(A),
        jnp.asarray(cc),
        jnp.asarray(lb),
        jnp.asarray(ub),
        jnp.asarray(basis),
        jnp.asarray(status),
        max_iterations=max_iter,
    )


def _solve_scipy(A_rows, row_lb, row_ub, col_lb, col_ub, c):
    m, n = A_rows.shape
    cons = []
    A_ub, b_ub = [], []
    A_eq, b_eq = [], []
    for i in range(m):
        if np.isfinite(row_ub[i]) and row_lb[i] == row_ub[i]:
            A_eq.append(A_rows[i])
            b_eq.append(row_ub[i])
        else:
            if np.isfinite(row_ub[i]):
                A_ub.append(A_rows[i])
                b_ub.append(row_ub[i])
            if np.isfinite(row_lb[i]):
                A_ub.append(-A_rows[i])
                b_ub.append(-row_lb[i])
    res = linprog(
        c,
        A_ub=np.array(A_ub) if A_ub else None,
        b_ub=np.array(b_ub) if b_ub else None,
        A_eq=np.array(A_eq) if A_eq else None,
        b_eq=np.array(b_eq) if b_eq else None,
        bounds=list(zip(col_lb, col_ub)),
        method="highs",
    )
    return res


def test_small_lp():
    # max x0 + 2 x1 s.t. x0 + x1 <= 1, x >= 0
    A_rows = np.array([[1.0, 1.0]])
    res = _solve_sleqp(
        A_rows,
        row_lb=np.array([-np.inf]),
        row_ub=np.array([1.0]),
        col_lb=np.zeros(2),
        col_ub=np.full(2, np.inf),
        c=np.array([-1.0, -2.0]),
    )
    assert int(res.state) == simplex.OPTIMAL
    np.testing.assert_allclose(np.asarray(res.x[:2]), [0.0, 1.0], atol=1e-10)
    np.testing.assert_allclose(float(res.obj), -2.0, atol=1e-10)


def test_bound_flip_lp():
    # min -x0 with 0 <= x0 <= 2 and a vacuous row
    A_rows = np.array([[1.0, 0.0]])
    res = _solve_sleqp(
        A_rows,
        row_lb=np.array([-10.0]),
        row_ub=np.array([10.0]),
        col_lb=np.zeros(2),
        col_ub=np.array([2.0, 1.0]),
        c=np.array([-1.0, 0.0]),
    )
    assert int(res.state) == simplex.OPTIMAL
    np.testing.assert_allclose(float(res.x[0]), 2.0, atol=1e-10)


def test_equality_rows():
    # min x0 + x1 s.t. x0 + 2 x1 == 3, 0 <= x <= 5
    A_rows = np.array([[1.0, 2.0]])
    res = _solve_sleqp(
        A_rows,
        row_lb=np.array([3.0]),
        row_ub=np.array([3.0]),
        col_lb=np.zeros(2),
        col_ub=np.full(2, 5.0),
        c=np.array([1.0, 1.0]),
    )
    # NOTE: slack start infeasible here (activity 0 outside [3,3])?
    # rest point: both cols at lower 0 -> activity 0, logical basic at 0
    # outside its [3,3] bounds -> infeasible start is NOT allowed.
    # The cauchy layer never produces this; this test instead starts the
    # logical nonbasic at its bound with col 0 basic.
    A, lb, ub, cc = _standard_form(
        A_rows,
        np.array([3.0]),
        np.array([3.0]),
        np.zeros(2),
        np.full(2, 5.0),
        np.array([1.0, 1.0]),
    )
    basis = np.array([0], dtype=np.int32)  # x0 basic = 3
    status = np.array(
        [BaseStat.BASIC, BaseStat.LOWER, BaseStat.UPPER], dtype=np.int8
    )
    res = simplex.solve(
        jnp.asarray(A),
        jnp.asarray(cc),
        jnp.asarray(np.where(np.isfinite(lb), lb, -INF)),
        jnp.asarray(np.where(np.isfinite(ub), ub, INF)),
        jnp.asarray(basis),
        jnp.asarray(status),
        max_iterations=100,
    )
    assert int(res.state) == simplex.OPTIMAL
    np.testing.assert_allclose(np.asarray(res.x[:2]), [0.0, 1.5], atol=1e-10)
    np.testing.assert_allclose(float(res.obj), 1.5, atol=1e-10)


@pytest.mark.parametrize("seed", range(8))
def test_random_vs_scipy(seed):
    """Random boxed LPs with ranged rows, 0 feasible at rest point."""
    rng = np.random.default_rng(seed)
    n, m = 6, 4
    A_rows = rng.standard_normal((m, n))
    col_lb = -rng.uniform(0.1, 2.0, n)
    col_ub = rng.uniform(0.1, 2.0, n)
    # rows contain 0 strictly so the all-at-zero... rest point is feasible
    row_lb = -rng.uniform(0.5, 3.0, m)
    row_ub = rng.uniform(0.5, 3.0, m)
    c = rng.standard_normal(n)

    # rest structural columns at the bound nearest zero: activity may not
    # be zero; make rows wide enough to contain it
    rest = np.where(np.abs(col_lb) <= np.abs(col_ub), col_lb, col_ub)
    act = A_rows @ rest
    row_lb = np.minimum(row_lb, act - 0.1)
    row_ub = np.maximum(row_ub, act + 0.1)

    res = _solve_sleqp(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    ref = _solve_scipy(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    assert ref.status == 0
    assert int(res.state) == simplex.OPTIMAL
    np.testing.assert_allclose(float(res.obj), ref.fun, rtol=1e-8, atol=1e-8)
    # primal feasibility of our solution
    x = np.asarray(res.x[:n])
    assert np.all(x >= col_lb - 1e-9) and np.all(x <= col_ub + 1e-9)
    act = A_rows @ x
    assert np.all(act >= row_lb - 1e-8) and np.all(act <= row_ub + 1e-8)


def test_duals_and_reduced_costs():
    """LP duality: c - A^T y = r with complementary sign structure."""
    rng = np.random.default_rng(42)
    n, m = 5, 3
    A_rows = rng.standard_normal((m, n))
    col_lb = -np.ones(n)
    col_ub = np.ones(n)
    row_lb = np.full(m, -2.0)
    row_ub = np.full(m, 2.0)
    c = rng.standard_normal(n)
    res = _solve_sleqp(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    assert int(res.state) == simplex.OPTIMAL
    r = np.asarray(res.reduced_costs)
    status = np.asarray(res.status)
    # basic: r == 0; at lower: r >= 0; at upper: r <= 0
    assert np.all(np.abs(r[status == BaseStat.BASIC]) < 1e-8)
    assert np.all(r[status == BaseStat.LOWER] > -1e-8)
    assert np.all(r[status == BaseStat.UPPER] < 1e-8)


def test_warm_start_few_pivots():
    """Re-solving from the optimal basis with a perturbed objective
    should take far fewer pivots than the cold solve."""
    rng = np.random.default_rng(7)
    n, m = 8, 5
    A_rows = rng.standard_normal((m, n))
    col_lb, col_ub = -np.ones(n), np.ones(n)
    row_lb, row_ub = np.full(m, -3.0), np.full(m, 3.0)
    c = rng.standard_normal(n)

    res1 = _solve_sleqp(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    assert int(res1.state) == simplex.OPTIMAL

    A, lb, ub, cc = _standard_form(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    cc2 = cc + 1e-3 * np.concatenate([rng.standard_normal(n), np.zeros(m)])
    res2 = simplex.solve(
        jnp.asarray(A),
        jnp.asarray(cc2),
        jnp.asarray(np.where(np.isfinite(lb), lb, -INF)),
        jnp.asarray(np.where(np.isfinite(ub), ub, INF)),
        res1.basis,
        res1.status,
        max_iterations=500,
    )
    assert int(res2.state) == simplex.OPTIMAL
    assert int(res2.iterations) <= max(2, int(res1.iterations) // 2)


def test_vmap_batch_of_lps():
    rng = np.random.default_rng(9)
    n, m, batch = 4, 2, 6
    A_rows = rng.standard_normal((batch, m, n))
    col_lb = -np.ones((batch, n))
    col_ub = np.ones((batch, n))
    row_lb = np.full((batch, m), -5.0)
    row_ub = np.full((batch, m), 5.0)
    cs = rng.standard_normal((batch, n))

    def solve_one(A_rows_i, c_i, row_lb_i, row_ub_i):
        A = jnp.concatenate([A_rows_i, -jnp.eye(m)], axis=1)
        lb = jnp.concatenate([jnp.full((n,), -1.0), row_lb_i])
        ub = jnp.concatenate([jnp.full((n,), 1.0), row_ub_i])
        cc = jnp.concatenate([c_i, jnp.zeros(m)])
        basis = n + jnp.arange(m, dtype=jnp.int32)
        status = jnp.concatenate(
            [
                jnp.full((n,), BaseStat.LOWER, dtype=jnp.int8),
                jnp.full((m,), BaseStat.BASIC, dtype=jnp.int8),
            ]
        )
        return simplex.solve(A, cc, lb, ub, basis, status, 200)

    batched = jax.jit(jax.vmap(solve_one))(
        jnp.asarray(A_rows),
        jnp.asarray(cs),
        jnp.asarray(row_lb),
        jnp.asarray(row_ub),
    )
    for b in range(batch):
        ref = _solve_scipy(
            A_rows[b], row_lb[b], row_ub[b], col_lb[b], col_ub[b], cs[b]
        )
        assert int(batched.state[b]) == simplex.OPTIMAL
        np.testing.assert_allclose(
            float(batched.obj[b]), ref.fun, rtol=1e-8, atol=1e-8
        )


def test_dual_simplex_reoptimizes_after_bound_shrink():
    """Shrinking column bounds keeps the optimal basis dual feasible but
    makes it primal infeasible — dual pivots must restore optimality in
    far fewer iterations than a cold solve (and match it exactly)."""
    rng = np.random.default_rng(11)
    n, m = 10, 6
    A_rows = rng.standard_normal((m, n))
    col_lb, col_ub = -np.ones(n), np.ones(n)
    c = rng.standard_normal(n)
    # rows wide enough that the cold slack-start stays primal feasible
    # for both boxes (the solver's documented precondition)
    wide = np.abs(A_rows) @ np.ones(n) + 0.5
    row_lb, row_ub = -wide, wide

    res1 = _solve_sleqp(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    assert int(res1.state) == simplex.OPTIMAL

    # shrink the box (the LP trust-radius pattern of the Cauchy layer)
    shrink = 0.4
    A, lb, ub, cc = _standard_form(
        A_rows, row_lb, row_ub, shrink * col_lb, shrink * col_ub, c
    )
    lb = np.where(np.isfinite(lb), lb, -INF)
    ub = np.where(np.isfinite(ub), ub, INF)

    dres = simplex.solve_dual(
        jnp.asarray(A),
        jnp.asarray(cc),
        jnp.asarray(lb),
        jnp.asarray(ub),
        res1.basis,
        res1.status,
        max_iterations=500,
    )
    assert int(dres.state) == simplex.OPTIMAL

    # finishing primal pass confirms optimality without extra pivots
    res2 = simplex.solve(
        jnp.asarray(A),
        jnp.asarray(cc),
        jnp.asarray(lb),
        jnp.asarray(ub),
        dres.basis,
        dres.status,
        max_iterations=500,
    )
    assert int(res2.state) == simplex.OPTIMAL
    assert int(res2.iterations) == 0

    cold = _solve_sleqp(
        A_rows, row_lb, row_ub, shrink * col_lb, shrink * col_ub, c
    )
    assert int(cold.state) == simplex.OPTIMAL
    np.testing.assert_allclose(float(res2.obj), float(cold.obj), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(res2.x), np.asarray(cold.x), atol=1e-9
    )
    assert int(dres.iterations) < int(cold.iterations)


@pytest.mark.parametrize("seed", range(5))
def test_dual_simplex_random_bound_changes(seed):
    """Random bound perturbations: dual stage + primal finish must agree
    with a cold solve."""
    rng = np.random.default_rng(100 + seed)
    n, m = 7, 4
    A_rows = rng.standard_normal((m, n))
    col_lb, col_ub = -np.ones(n), np.ones(n)
    row_lb, row_ub = np.full(m, -3.0), np.full(m, 3.0)
    c = rng.standard_normal(n)

    res1 = _solve_sleqp(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    assert int(res1.state) == simplex.OPTIMAL

    scale = rng.uniform(0.2, 0.9)
    new_lb, new_ub = scale * col_lb, scale * col_ub
    A, lb, ub, cc = _standard_form(A_rows, row_lb, row_ub, new_lb, new_ub, c)
    lb = np.where(np.isfinite(lb), lb, -INF)
    ub = np.where(np.isfinite(ub), ub, INF)

    dres = simplex.solve_dual(
        jnp.asarray(A), jnp.asarray(cc), jnp.asarray(lb), jnp.asarray(ub),
        res1.basis, res1.status, max_iterations=500,
    )
    res2 = simplex.solve(
        jnp.asarray(A), jnp.asarray(cc), jnp.asarray(lb), jnp.asarray(ub),
        dres.basis, dres.status, max_iterations=500,
    )
    ref = _solve_scipy(A_rows, row_lb, row_ub, new_lb, new_ub, c)
    assert int(dres.state) == simplex.OPTIMAL
    assert int(res2.state) == simplex.OPTIMAL
    assert ref.status == 0
    np.testing.assert_allclose(float(res2.obj), ref.fun, rtol=1e-9, atol=1e-9)
    x = np.asarray(res2.x)
    assert np.all(x >= lb - 1e-9) and np.all(x <= ub + 1e-9)


def test_write_lp_dump(tmp_path):
    """LP write op (lpi_types.h:100-118): CPLEX-format dump round-trip."""
    import numpy as np

    from sleqp_tpu.cauchy import dump_cauchy_lp
    from sleqp_tpu.iterate import create_iterate
    from tests.fixtures import hs71_problem

    problem, x0, _ = hs71_problem()
    it = create_iterate(problem, x0)
    path = tmp_path / "lp.lp"
    dump_cauchy_lp(problem.data, it, 1.0, 10.0, str(path))
    text = path.read_text()
    assert text.startswith("\\ cauchy_lp")
    assert "Minimize" in text and "Subject To" in text and "Bounds" in text
    # n + 3m columns and m rows for HS71 (n=4, m=2)
    assert " r1:" in text and " r2:" not in text.split("Bounds")[0][-40:]
    assert "x9" in text  # 4 + 3*2 = 10 columns -> x0..x9
