"""Mixed-precision (compute_dtype="float32") path tests.

The TPU fast path runs the sequential inner solvers (simplex pivoting,
GLTR/Krylov loop) in float32 and escalates back to float64: basis
refactorization (ops/simplex.py refine_result) plus an exact dual/primal
finishing pass (polish_full_precision).  These tests pin:

* end-to-end parity: the mixed mode must solve the same fixtures to the
  same 1e-6 KKT tolerances as the float64 path (reference bar:
  BASELINE.md "CUTEst solved-% at matched KKT tolerance");
* the two problems mixed mode regressed in round 2 (hs30/hs49-style
  near-convergence LPs where float32 pricing cannot resolve reduced
  costs at the stationarity scale);
* the escalation primitives in isolation (refine_result finiteness
  guard, polish_full_precision pivot repair, default_tols selection).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu import Func, Problem, Settings, Status
from sleqp_tpu.ops import simplex
from sleqp_tpu.problem_solver import solve

from fixtures import (
    hs6_problem,
    hs35_problem,
    hs71_problem,
    quadcons_problem,
    rosenbrock_problem,
)

MIXED = Settings(compute_dtype="float32")


def _solve_and_check(make, settings=MIXED, max_iterations=100, tol=1e-6):
    problem, x0, x_opt = make()
    state = solve(problem, settings, x0, max_iterations=max_iterations)
    assert int(state.status) == Status.OPTIMAL, (
        f"status={Status(int(state.status)).name} iter={int(state.iteration)} "
        f"feas={float(state.feas_res):.2e} stat={float(state.stat_res):.2e}"
    )
    np.testing.assert_allclose(np.asarray(state.it.x), x_opt, atol=tol)
    return state


@pytest.mark.parametrize(
    "make",
    [rosenbrock_problem, quadcons_problem, hs6_problem, hs35_problem,
     hs71_problem],
    ids=["rosenbrock", "quadcons", "hs6", "hs35", "hs71"],
)
def test_mixed_fixtures(make):
    _solve_and_check(make)


def test_mixed_hs30_near_convergence():
    """Round-2 regression: float32 LP pricing near the solution.

    At the solution (1, 0, 0) the reduced costs shrink to the
    stationarity scale ~1e-5, below the float32 optimality tolerance
    scaled by the O(penalty) objective; without the float64 finishing
    pass the LP keeps a wrong basis and the solve dies at a deadpoint.
    """

    def obj(x):
        return jnp.vdot(x, x)

    def cons(x):
        return jnp.array([x[0] ** 2 + x[1] ** 2])

    func = Func(obj, num_variables=3, cons=cons, num_cons=1)
    problem = Problem(
        func,
        var_lb=jnp.array([1.0, -10.0, -10.0]),
        var_ub=jnp.array([10.0, 10.0, 10.0]),
        general_lb=jnp.array([1.0]),
        general_ub=jnp.array([jnp.inf]),
    )
    x0 = jnp.array([1.0, 1.0, 1.0])
    state = solve(problem, MIXED, x0, max_iterations=100)
    assert int(state.status) == Status.OPTIMAL
    # At x = (1, t, 0) the nearly-active constraint x1^2+x2^2 >= 1 can
    # legitimately stay in the working set with dual 1 (slack
    # complementarity t^2 <= slack_tol), so the KKT tolerances only pin
    # |x2| <= sqrt(slack_tol) ~ 1e-3 — the float64 path stops at
    # x2 ~ 1.3e-4 for the same reason.  Mixed mode must match that
    # guarantee, not beat it.
    x = np.asarray(state.it.x)
    np.testing.assert_allclose(x[[0, 2]], [1.0, 0.0], atol=5e-6)
    assert abs(x[1]) <= 1.5e-3
    assert float(state.stat_res) <= 1e-6
    assert float(state.feas_res) <= 1e-6


def test_mixed_hs49_flat_curvature():
    """Round-2 regression: quartic/sextic objective with equality rows."""

    def obj(x):
        return (
            (x[0] - x[1]) ** 2
            + (x[2] - 1.0) ** 2
            + (x[3] - 1.0) ** 4
            + (x[4] - 1.0) ** 6
        )

    def cons(x):
        return jnp.array(
            [x[0] + x[1] + x[2] + 4.0 * x[3], x[2] + 5.0 * x[4]]
        )

    func = Func(obj, num_variables=5, cons=cons, num_cons=2)
    problem = Problem(
        func,
        general_lb=jnp.array([7.0, 6.0]),
        general_ub=jnp.array([7.0, 6.0]),
    )
    x0 = jnp.array([10.0, 7.0, 2.0, -3.0, 0.8])
    state = solve(problem, MIXED, x0, max_iterations=200)
    assert int(state.status) == Status.OPTIMAL
    assert float(state.it.obj_val) < 1e-6


def _toy_lp():
    """min -x0 - 2 x1 s.t. x0 + x1 + w = 0, w in [-4, -?]; box [0,3]."""
    dtype = jnp.float64
    A = jnp.array([[1.0, 1.0, -1.0]], dtype=dtype)
    c = jnp.array([-1.0, -2.0, 0.0], dtype=dtype)
    lb = jnp.array([0.0, 0.0, 0.0], dtype=dtype)
    ub = jnp.array([3.0, 3.0, 4.0], dtype=dtype)
    return A, c, lb, ub


def test_polish_full_precision_repairs_wrong_basis():
    """A deliberately suboptimal (but feasible) basis must be re-solved
    to optimality by the float64 finishing pass."""
    A, c, lb, ub = _toy_lp()
    # slack basic, both x at LOWER: feasible (w=0) but not optimal
    basis = jnp.array([2], dtype=jnp.int32)
    status = jnp.array(
        [simplex.BaseStat.LOWER, simplex.BaseStat.LOWER, simplex.BaseStat.BASIC],
        dtype=jnp.int8,
    )
    res = simplex.SimplexResult(
        x=jnp.zeros(3, dtype=A.dtype),
        duals=jnp.zeros(1, dtype=A.dtype),
        reduced_costs=c,
        status=status,
        basis=basis,
        obj=jnp.asarray(0.0, A.dtype),
        state=jnp.asarray(simplex.OPTIMAL, jnp.int32),  # f32 lied
        iterations=jnp.asarray(0, jnp.int32),
        condition=jnp.asarray(1.0, A.dtype),
    )
    out = simplex.polish_full_precision(A, c, lb, ub, res, max_iterations=50)
    # optimum: x1 = 3 (cost -2 dominates), x0 = 1 fills w's ub 4
    assert int(out.state) == simplex.OPTIMAL
    np.testing.assert_allclose(np.asarray(out.x[:2]), [1.0, 3.0], atol=1e-9)
    np.testing.assert_allclose(float(out.obj), -7.0, atol=1e-9)


def test_polish_full_precision_noop_on_optimal_basis():
    """An already-optimal basis exits the escalation with zero pivots
    beyond the feasibility/pricing checks and identical results."""
    A, c, lb, ub = _toy_lp()
    crash_basis = jnp.array([2], dtype=jnp.int32)
    crash_status = jnp.array(
        [simplex.BaseStat.LOWER, simplex.BaseStat.LOWER, simplex.BaseStat.BASIC],
        dtype=jnp.int8,
    )
    ref = simplex.solve(A, c, lb, ub, crash_basis, crash_status, 50)
    out = simplex.polish_full_precision(A, c, lb, ub, ref, max_iterations=50)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x))
    assert int(out.state) == simplex.OPTIMAL


def test_refine_result_finiteness_guard():
    """A singular basis at full precision must not leak inf/nan; the
    state is demoted so the basis is not saved for warm starts."""
    dtype = jnp.float64
    A = jnp.array([[1.0, 1.0, 0.0]], dtype=dtype)  # col 2 is zero
    c = jnp.array([1.0, 1.0, 0.0], dtype=dtype)
    lb = jnp.array([0.0, 0.0, 0.0], dtype=dtype)
    ub = jnp.array([1.0, 1.0, 1.0], dtype=dtype)
    res = simplex.SimplexResult(
        x=jnp.zeros(3, dtype=dtype),
        duals=jnp.zeros(1, dtype=dtype),
        reduced_costs=c,
        status=jnp.array(
            [simplex.BaseStat.LOWER, simplex.BaseStat.LOWER,
             simplex.BaseStat.BASIC],
            dtype=jnp.int8,
        ),
        basis=jnp.array([2], dtype=jnp.int32),  # singular: A[:,2] == 0
        obj=jnp.asarray(0.0, dtype),
        state=jnp.asarray(simplex.OPTIMAL, jnp.int32),
        iterations=jnp.asarray(0, jnp.int32),
        condition=jnp.asarray(1.0, dtype),
    )
    out = simplex.refine_result(A, c, lb, ub, res)
    assert bool(jnp.all(jnp.isfinite(out.x)))
    assert bool(jnp.all(jnp.isfinite(out.duals)))
    assert int(out.state) != simplex.OPTIMAL


def test_default_tols_by_dtype():
    t32 = simplex.default_tols(jnp.float32)
    t64 = simplex.default_tols(jnp.float64)
    assert t32["opt_tol"] > t64["opt_tol"]
    assert t32["piv_tol"] > t64["piv_tol"]
    eps32 = float(jnp.finfo(jnp.float32).eps)
    assert t32["piv_tol"] >= eps32  # pivots below eps are noise


def test_compute_dtype_validation():
    with pytest.raises(ValueError):
        Settings(compute_dtype="fp32")
    with pytest.raises(ValueError):
        Settings(dtype="double")
    Settings(compute_dtype="float32")  # ok
    Settings(compute_dtype="same")  # ok


def test_mixed_vmapped_batch():
    """The mixed path must stay vmap-able (the bench configuration)."""
    from sleqp_tpu.parallel.batch import batched_initial_state
    from sleqp_tpu.problem_solver import solve_jit

    problem, x0, x_opt = hs71_problem()
    rng = np.random.default_rng(0)
    x0b = jnp.clip(
        x0[None, :] + jnp.asarray(rng.uniform(-0.05, 0.05, (4, 4))), 1.0, 5.0
    )
    state0 = batched_initial_state(problem, MIXED, x0b)
    fn = jax.jit(jax.vmap(lambda s: solve_jit(problem, MIXED, s, 60)))
    out = fn(state0)
    assert int(np.sum(np.asarray(out.status) == Status.OPTIMAL)) == 4
    np.testing.assert_allclose(
        np.asarray(out.it.x), np.tile(x_opt, (4, 1)), atol=1e-5
    )


def test_batched_solve_mp_two_phase():
    """Two-phase f32-bulk + f64-polish batched solve (batched_solve_mp):
    every lane must reach the full float64 KKT tolerances and match the
    pure-float64 batched solve's objective (BASELINE config 2 TPU
    configuration; no reference equivalent — SLEQP is double-precision
    throughout, src/main)."""
    from sleqp_tpu.parallel.batch import batched_solve, batched_solve_mp

    problem, x0, x_opt = hs71_problem()
    rng = np.random.default_rng(3)
    B = 8
    x0b = jnp.clip(
        x0[None, :] + jnp.asarray(rng.uniform(-0.05, 0.05, (B, 4))),
        1.0,
        5.0,
    )
    out = batched_solve_mp(problem, Settings(), x0b, max_iterations=60)
    assert int(np.sum(np.asarray(out.status) == Status.OPTIMAL)) == B
    assert float(np.max(np.asarray(out.feas_res))) <= 1e-6
    assert float(np.max(np.asarray(out.stat_res))) <= 1e-6
    ref = batched_solve(problem, Settings(), x0b, max_iterations=60)
    np.testing.assert_allclose(
        np.asarray(out.it.obj_val), np.asarray(ref.it.obj_val), rtol=1e-7
    )
    # iteration counts both phases: at least as many as the f64 polish
    assert int(np.min(np.asarray(out.iteration))) >= 1


def test_batched_solve_chunked():
    """Chunked driver keeps every XLA program at <= chunk_size lanes
    (workaround for the >1024-instance fused-program worker fault) and
    reassembles the full batch, padding lanes dropped."""
    from sleqp_tpu.parallel.batch import batched_solve_chunked

    problem, x0, _ = hs71_problem()
    rng = np.random.default_rng(5)
    B = 11  # 2 chunks of 4 + padded chunk
    x0b = jnp.clip(
        x0[None, :] + jnp.asarray(rng.uniform(-0.05, 0.05, (B, 4))),
        1.0,
        5.0,
    )
    out = batched_solve_chunked(
        problem, Settings(), x0b, max_iterations=60, chunk_size=4
    )
    assert out.it.x.shape == (B, 4)
    assert int(np.sum(np.asarray(out.status) == Status.OPTIMAL)) == B
