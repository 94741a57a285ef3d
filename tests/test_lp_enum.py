"""Parallel vertex-enumeration LP backend (ops/lp_enum.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linprog

from sleqp_tpu import Settings, Status
from sleqp_tpu.ops import lp_enum
from sleqp_tpu.types import LPSolver

from fixtures import hs71_problem, wachbieg_problem


def _random_cauchy_like(rng):
    """A random LP with the Cauchy structure [J, I, -I, -I]."""
    m = int(rng.integers(1, 4))
    n = int(rng.integers(2, 6))
    A = np.concatenate(
        [rng.standard_normal((m, n)), np.eye(m), -np.eye(m), -np.eye(m)],
        axis=1,
    )
    lb = np.concatenate(
        [rng.uniform(-2, -0.5, n), np.zeros(2 * m), rng.uniform(-3, 0, m)]
    )
    ub = np.concatenate(
        [rng.uniform(0.5, 2, n), np.full(2 * m, 1e20), rng.uniform(0.5, 3, m)]
    )
    c = np.concatenate(
        [rng.standard_normal(n), np.full(2 * m, 10.0), np.zeros(m)]
    )
    return A, lb, ub, c


def test_enum_matches_linprog():
    """Enumeration returns the scipy-linprog (HiGHS) optimum on random
    Cauchy-structured LPs, with a feasible vertex and consistent duals."""
    rng = np.random.default_rng(3)
    for _ in range(40):
        A, lb, ub, c = _random_cauchy_like(rng)
        m, N = A.shape
        res = lp_enum.solve_enum(
            jnp.asarray(A), jnp.asarray(c), jnp.asarray(lb), jnp.asarray(ub)
        )
        ref = linprog(
            c,
            A_eq=A,
            b_eq=np.zeros(m),
            bounds=[
                (
                    lo if lo > -1e19 else None,
                    hi if hi < 1e19 else None,
                )
                for lo, hi in zip(lb, ub)
            ],
            method="highs",
        )
        assert ref.status == 0
        np.testing.assert_allclose(
            float(res.obj), ref.fun, rtol=1e-8, atol=1e-8
        )
        x = np.asarray(res.x)
        np.testing.assert_allclose(A @ x, 0.0, atol=1e-9)
        assert np.all(x >= lb - 1e-9) and np.all(x <= ub + 1e-9)
        # dual feasibility of the returned reduced costs
        r = np.asarray(res.reduced_costs)
        finite_lb = lb > -1e19
        finite_ub = ub < 1e19
        tol = 1e-7 * (1 + np.abs(c))
        assert np.all(r[~finite_lb] <= tol[~finite_lb])
        assert np.all(r[~finite_ub] >= -tol[~finite_ub])


def test_enum_auto_resolution():
    from sleqp_tpu.cauchy import resolved_lp_solver

    # tiny constrained problem -> ENUM
    assert resolved_lp_solver(Settings(), 4, 2) == LPSolver.ENUM
    # too many rows -> simplex
    assert resolved_lp_solver(Settings(), 10, 8) == LPSolver.SIMPLEX
    # huge -> PDLP
    assert resolved_lp_solver(Settings(), 10000, 100) == LPSolver.PDLP
    # explicit settings win
    assert (
        resolved_lp_solver(Settings(lp_solver=LPSolver.SIMPLEX), 4, 2)
        == LPSolver.SIMPLEX
    )


@pytest.mark.parametrize("fixture", [hs71_problem, wachbieg_problem])
def test_enum_end_to_end(fixture):
    """Full solves through the ENUM backend reach the known optimum
    (wachbieg exercises the restoration path on top)."""
    from sleqp_tpu.solver import Solver

    problem, x0, x_opt = fixture()
    solver = Solver(problem, x0, Settings(lp_solver=LPSolver.ENUM))
    status = solver.solve(max_iterations=200)
    assert status == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(solver.solution), x_opt, atol=1e-5)


def test_enum_batched_matches_simplex_path():
    """vmapped solves with ENUM: all instances reach the optimum."""
    from sleqp_tpu.parallel.batch import batched_initial_state
    from sleqp_tpu.problem_solver import solve_jit

    problem, x0, x_opt = hs71_problem()
    settings = Settings(lp_solver=LPSolver.ENUM)
    batch = 8
    x0b = jnp.tile(x0[None, :], (batch, 1)) + 0.01 * jnp.arange(batch)[:, None]
    state0 = batched_initial_state(problem, settings, x0b)
    out = jax.jit(
        jax.vmap(lambda s: solve_jit(problem, settings, s, 60))
    )(state0)
    assert int(jnp.sum(out.status == Status.OPTIMAL)) == batch
    np.testing.assert_allclose(
        np.asarray(out.it.x), np.tile(np.asarray(x_opt), (batch, 1)), atol=1e-4
    )
