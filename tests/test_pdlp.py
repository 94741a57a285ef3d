"""First-order LP solver (ops/pdlp.py) cross-checked against the
revised simplex and scipy on the same fixtures as test_simplex.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu.ops import pdlp, simplex
from sleqp_tpu.types import INF, BaseStat

from test_simplex import _solve_scipy, _solve_sleqp, _standard_form


def _solve_pdlp(A_rows, row_lb, row_ub, col_lb, col_ub, c, **kw):
    A, lb, ub, cc = _standard_form(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    lb = np.where(np.isfinite(lb), lb, -INF)
    ub = np.where(np.isfinite(ub), ub, INF)
    return pdlp.solve(
        jnp.asarray(A), jnp.asarray(cc), jnp.asarray(lb), jnp.asarray(ub), **kw
    )


@pytest.mark.parametrize("seed", range(4))
def test_pdlp_matches_simplex(seed):
    rng = np.random.default_rng(seed)
    n, m = 6, 4
    A_rows = rng.standard_normal((m, n))
    col_lb = -rng.uniform(0.5, 2.0, n)
    col_ub = rng.uniform(0.5, 2.0, n)
    wide = np.abs(A_rows) @ np.maximum(np.abs(col_lb), np.abs(col_ub)) + 0.5
    row_lb, row_ub = -wide, wide
    c = rng.standard_normal(n)

    res = _solve_pdlp(A_rows, row_lb, row_ub, col_lb, col_ub, c, tol=1e-9)
    ref = _solve_sleqp(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    assert int(ref.state) == simplex.OPTIMAL
    assert int(res.state) == pdlp.OPTIMAL
    np.testing.assert_allclose(float(res.obj), float(ref.obj), atol=1e-6)
    # primal feasibility
    x = np.asarray(res.x[:n])
    assert np.all(x >= col_lb - 1e-7) and np.all(x <= col_ub + 1e-7)


def test_pdlp_status_synthesis_matches_active_set():
    """At a nondegenerate vertex the synthesized statuses agree with the
    simplex basis statuses on the structural columns."""
    rng = np.random.default_rng(5)
    n, m = 8, 3
    A_rows = rng.standard_normal((m, n))
    col_lb, col_ub = -np.ones(n), np.ones(n)
    wide = np.abs(A_rows) @ np.ones(n) + 0.5
    row_lb, row_ub = -wide, wide
    c = rng.standard_normal(n)

    res = _solve_pdlp(A_rows, row_lb, row_ub, col_lb, col_ub, c, tol=1e-10)
    ref = _solve_sleqp(A_rows, row_lb, row_ub, col_lb, col_ub, c)
    assert int(res.state) == pdlp.OPTIMAL
    s_pdlp = np.asarray(res.status[:n])
    s_ref = np.asarray(ref.status[:n])
    at_bound = (s_ref == BaseStat.LOWER) | (s_ref == BaseStat.UPPER)
    np.testing.assert_array_equal(s_pdlp[at_bound], s_ref[at_bound])


def test_pdlp_warm_start_converges_faster():
    rng = np.random.default_rng(8)
    n, m = 12, 6
    A_rows = rng.standard_normal((m, n))
    col_lb, col_ub = -np.ones(n), np.ones(n)
    wide = np.abs(A_rows) @ np.ones(n) + 0.5
    row_lb, row_ub = -wide, wide
    c = rng.standard_normal(n)

    cold = _solve_pdlp(A_rows, row_lb, row_ub, col_lb, col_ub, c, tol=1e-9)
    assert int(cold.state) == pdlp.OPTIMAL
    # perturb the objective slightly and restart from the solution
    c2 = c + 1e-4 * rng.standard_normal(n)
    A, lb, ub, cc2 = _standard_form(
        A_rows, row_lb, row_ub, col_lb, col_ub, c2
    )
    lb = np.where(np.isfinite(lb), lb, -INF)
    ub = np.where(np.isfinite(ub), ub, INF)
    warm = pdlp.solve(
        jnp.asarray(A),
        jnp.asarray(cc2),
        jnp.asarray(lb),
        jnp.asarray(ub),
        x0=cold.x,
        y0=-cold.duals,
        tol=1e-9,
    )
    assert int(warm.state) == pdlp.OPTIMAL
    assert int(warm.iterations) < int(cold.iterations)


def test_pdlp_large_cauchy_shaped_lp():
    """A penalty-LP-shaped instance (J with appended +-I slack columns)
    at a size where the simplex pivot chain would dominate."""
    rng = np.random.default_rng(13)
    n, m = 400, 120
    J = rng.standard_normal((m, n)) / np.sqrt(n)
    g = rng.standard_normal(n)
    cons_val = rng.standard_normal(m) * 0.1
    radius = 0.5
    penalty = 10.0

    eye = np.eye(m)
    A = np.hstack([J, eye, -eye, -eye])
    lb = np.concatenate(
        [-radius * np.ones(n), np.zeros(2 * m), -cons_val - 0.2]
    )
    ub = np.concatenate(
        [radius * np.ones(n), INF * np.ones(2 * m), -cons_val + 0.2]
    )
    c = np.concatenate([g, penalty * np.ones(2 * m), np.zeros(m)])

    res = pdlp.solve(
        jnp.asarray(A),
        jnp.asarray(c),
        jnp.asarray(lb),
        jnp.asarray(ub),
        tol=1e-7,
        max_iterations=60000,
    )
    assert int(res.state) == pdlp.OPTIMAL
    ref = _solve_scipy(
        J, -cons_val - 0.2, -cons_val + 0.2,
        -radius * np.ones(n), radius * np.ones(n), g,
    )
    # scipy objective excludes the slack penalty; at a feasible optimum
    # the slacks vanish, so the objectives agree
    assert ref.status == 0
    np.testing.assert_allclose(float(res.obj), ref.fun, atol=5e-4)


# ---------------------------------------------------------------------------
# PDLP as the Cauchy LP backend (lp_solver setting)
# ---------------------------------------------------------------------------


def test_pdlp_cauchy_backend_matches_simplex():
    """solve_cauchy_lp(lp_solver=PDLP) reproduces the simplex backend's
    step and working set on a constrained fixture."""
    import jax.numpy as jnp
    import numpy as np

    from fixtures import hs71_problem
    from sleqp_tpu import create_iterate
    from sleqp_tpu.cauchy import empty_basis, solve_cauchy_lp
    from sleqp_tpu.ops import simplex
    from sleqp_tpu.types import LPSolver

    problem, x0, _ = hs71_problem()
    it = create_iterate(problem, jnp.asarray(x0))
    basis = empty_basis(problem.num_variables, problem.num_cons)
    radius = jnp.asarray(0.5)
    penalty = jnp.asarray(10.0)

    ref = solve_cauchy_lp(problem.data, it, radius, penalty, basis)
    res = solve_cauchy_lp(
        problem.data, it, radius, penalty, basis,
        lp_solver=LPSolver.PDLP, pdlp_tol=1e-10,
    )
    assert int(res.lp_state) == simplex.OPTIMAL
    np.testing.assert_allclose(
        np.asarray(res.lp_step), np.asarray(ref.lp_step), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(res.var_states), np.asarray(ref.var_states)
    )
    np.testing.assert_array_equal(
        np.asarray(res.cons_states), np.asarray(ref.cons_states)
    )
    np.testing.assert_allclose(
        np.asarray(res.cons_dual), np.asarray(ref.cons_dual), atol=1e-6
    )
    # the saved basis passes through untouched
    assert not bool(res.basis.valid)


def test_pdlp_backend_full_solve():
    """End-to-end NLP solve with lp_solver=PDLP reaches the optimum."""
    from sleqp_tpu import Settings, Solver, Status
    from sleqp_tpu.harness import hs
    from sleqp_tpu.types import LPSolver

    problem, x0, f_opt = hs.get_problem("hs35")
    settings = Settings(lp_solver=LPSolver.PDLP, pdlp_tol=1e-10)
    solver = Solver(problem, x0, settings)
    status = solver.solve(max_iterations=100)
    assert status == Status.OPTIMAL
    assert abs(solver.obj_val - f_opt) <= 1e-5 * (1.0 + abs(f_opt))


def test_lp_solver_auto_threshold():
    """AUTO resolves by LP column count against pdlp_threshold."""
    from sleqp_tpu import Settings
    from sleqp_tpu.cauchy import resolved_lp_solver
    from sleqp_tpu.types import LPSolver

    s = Settings(pdlp_threshold=100)
    assert resolved_lp_solver(s, 10, 5) == LPSolver.SIMPLEX  # N = 25
    assert resolved_lp_solver(s, 70, 10) == LPSolver.PDLP  # N = 100
    assert resolved_lp_solver(s, 1000, 0) == LPSolver.SIMPLEX  # box-only
    s2 = Settings(lp_solver=LPSolver.SIMPLEX, pdlp_threshold=1)
    assert resolved_lp_solver(s2, 1000, 1000) == LPSolver.SIMPLEX
