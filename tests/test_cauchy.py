"""Tests for the Cauchy LP layer: step, working set, duals, warm starts.

Mirrors the reference layer tests (cauchy_test.c, constrained_cauchy_test.c,
box_constrained_cauchy_test.c).
"""

import jax.numpy as jnp
import numpy as np

from sleqp_tpu import create_iterate
from sleqp_tpu.cauchy import (
    empty_basis,
    solve_box_cauchy,
    solve_cauchy_lp,
)
from sleqp_tpu.ops import simplex
from sleqp_tpu.types import ActiveState

from fixtures import (
    hs71_problem,
    linear_problem,
    quadcons_problem,
    quadfunc_problem,
    wachbieg_problem,
)


def _solve(problem, x, radius, penalty):
    it = create_iterate(problem, jnp.asarray(x))
    res = solve_cauchy_lp(
        problem.data,
        it,
        jnp.asarray(radius),
        jnp.asarray(penalty),
        empty_basis(problem.num_variables, problem.num_cons),
    )
    return it, res


def test_linear_problem_step():
    """For a pure LP the Cauchy step solves the problem in one go."""
    problem, x0, x_opt = linear_problem()
    it, res = _solve(problem, x0, radius=10.0, penalty=10.0)
    assert int(res.lp_state) == simplex.OPTIMAL
    np.testing.assert_allclose(np.asarray(it.x + res.lp_step), x_opt, atol=1e-9)
    # linear row active at upper bound (x0 + x1 = 1)
    assert int(res.cons_states[0]) == ActiveState.ACTIVE_UPPER
    # x0 at its lower bound
    assert int(res.var_states[0]) == ActiveState.ACTIVE_LOWER
    # duals: stationarity grad + J^T mu + nu = 0:
    # [-1,-2] + mu*[1,1] + nu = 0 with mu = 2, nu = [-1, 0]
    np.testing.assert_allclose(float(res.cons_dual[0]), 2.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.vars_dual), [-1.0, 0.0], atol=1e-9)


def test_dual_sign_conventions():
    """Trimmed duals respect the NLP convention: upper >= 0, lower <= 0."""
    problem, x0, _ = hs71_problem()
    it, res = _solve(problem, x0, radius=0.5, penalty=10.0)
    assert int(res.lp_state) == simplex.OPTIMAL
    cd = np.asarray(res.cons_dual)
    vd = np.asarray(res.vars_dual)
    cstates = np.asarray(res.cons_states)
    vstates = np.asarray(res.var_states)
    assert np.all(cd[cstates == ActiveState.ACTIVE_UPPER] >= 0)
    assert np.all(cd[cstates == ActiveState.ACTIVE_LOWER] <= 0)
    assert np.all(vd[vstates == ActiveState.ACTIVE_UPPER] >= 0)
    assert np.all(vd[vstates == ActiveState.ACTIVE_LOWER] <= 0)
    assert np.all(cd[cstates == ActiveState.INACTIVE] == 0)
    assert np.all(vd[vstates == ActiveState.INACTIVE] == 0)


def test_violated_constraint_slack():
    """HS71 at the start point violates cons 1 (sum sq = 52 > 40)."""
    problem, x0, _ = hs71_problem()
    it, res = _solve(problem, x0, radius=0.1, penalty=1.0)
    # with a small radius the violation cannot be fully corrected
    assert float(res.violation) > 0.0
    assert not bool(res.locally_infeasible)


def test_feasible_point_no_violation():
    problem, x0, _ = quadcons_problem()
    it, res = _solve(problem, x0, radius=0.25, penalty=10.0)
    assert float(res.violation) == 0.0


def test_wachbieg_progress_toward_feasibility():
    problem, x0, _ = wachbieg_problem()
    it, res = _solve(problem, x0, radius=1.0, penalty=10.0)
    assert int(res.lp_state) == simplex.OPTIMAL
    d = np.asarray(res.lp_step)
    c_lin = np.asarray(it.cons_val) + np.asarray(it.cons_jac) @ d
    viol0 = np.sum(np.abs(np.asarray(it.cons_val)))
    viol1 = np.sum(np.abs(c_lin))
    assert viol1 < viol0  # LP reduces linearized violation


def test_box_cauchy_matches_lp():
    """The closed-form box variant equals the LP on a box problem."""
    problem, x0, _ = quadfunc_problem()
    it = create_iterate(problem, jnp.asarray(x0))
    res_box = solve_box_cauchy(problem.data, it, jnp.asarray(1.5))
    # direct check: d = -radius * sign(g) clipped to box
    g = np.asarray(it.obj_grad)
    np.testing.assert_allclose(
        np.asarray(res_box.lp_step), -1.5 * np.sign(g), atol=1e-12
    )


def test_warm_start_reuses_basis():
    problem, x0, _ = hs71_problem()
    it, res1 = _solve(problem, x0, radius=0.5, penalty=10.0)
    assert int(res1.lp_state) == simplex.OPTIMAL

    # same LP solved again from the saved basis: zero pivots
    res2 = solve_cauchy_lp(
        problem.data,
        it,
        jnp.asarray(0.5),
        jnp.asarray(10.0),
        res1.basis,
    )
    assert int(res2.lp_state) == simplex.OPTIMAL
    assert int(res2.lp_iterations) == 0
    np.testing.assert_allclose(
        np.asarray(res2.lp_step), np.asarray(res1.lp_step), atol=1e-12
    )

    # slightly moved iterate: warm start should need very few pivots
    it3 = create_iterate(problem, jnp.asarray(x0) + 0.01)
    res3 = solve_cauchy_lp(
        problem.data, it3, jnp.asarray(0.5), jnp.asarray(10.0), res1.basis
    )
    assert int(res3.lp_state) == simplex.OPTIMAL
    assert int(res3.lp_iterations) <= int(res1.lp_iterations)


def test_equality_constraint_active_both():
    problem, x0, _ = wachbieg_problem()
    # from a feasible point of the equalities: x = (1, 0, 0.5)
    x_feas = jnp.array([1.0, 0.0, 0.5])
    it, res = _solve(problem, x_feas, radius=0.5, penalty=10.0)
    assert int(res.lp_state) == simplex.OPTIMAL
    # feasible point: the LP keeps d = 0
    np.testing.assert_allclose(np.asarray(res.lp_step), 0.0, atol=1e-12)
    # at least the first equality is picked up as ACTIVE_BOTH; a tight
    # row whose logical column stays basic with zero dual may legitimately
    # remain inactive (degenerate basis, reference standard_cauchy.c:700+)
    assert int(res.cons_states[0]) == ActiveState.ACTIVE_BOTH


def test_reduced_resolve_degenerate_tie():
    """A tight row left basic with zero-value basic slack gets picked up
    by the reduced resolve (standard_cauchy.c:566-788)."""
    problem, x0, _ = wachbieg_problem()
    x_feas = jnp.array([1.0, 0.0, 0.5])
    it = create_iterate(problem, x_feas)
    res = solve_cauchy_lp(
        problem.data,
        it,
        jnp.asarray(0.5),
        jnp.asarray(10.0),
        empty_basis(problem.num_variables, problem.num_cons),
        lp_resolves=True,
    )
    assert int(res.lp_state) == simplex.OPTIMAL
    np.testing.assert_allclose(np.asarray(res.lp_step), 0.0, atol=1e-12)
    # without resolves the second equality stayed INACTIVE (degenerate);
    # the resolve may or may not trigger depending on the dual — either
    # way the first equality must be active and results stay consistent
    assert int(res.cons_states[0]) != ActiveState.INACTIVE


def test_lp_resolves_off_matches_legacy():
    problem, x0, _ = hs71_problem()
    it = create_iterate(problem, jnp.asarray(x0))
    kw = dict(
        data=problem.data,
        it=it,
        trust_radius=jnp.asarray(0.5),
        penalty=jnp.asarray(10.0),
        saved_basis=empty_basis(4, 2),
    )
    res_on = solve_cauchy_lp(**kw, lp_resolves=True)
    res_off = solve_cauchy_lp(**kw, lp_resolves=False)
    # nondegenerate case: resolve must not change anything
    np.testing.assert_allclose(
        np.asarray(res_on.lp_step), np.asarray(res_off.lp_step), atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(res_on.cons_states), np.asarray(res_off.cons_states)
    )
