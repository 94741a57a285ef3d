"""Batched / in-graph restoration (restoration.py solve_with_restoration).

The host-side phase toggling in Solver.solve is unavailable inside one
compiled program; batched/sharded lanes that hit LOCALLY_INFEASIBLE get a
bounded in-graph restoration attempt instead (solver/solve.c:195-238
semantics as a pure function).  Also pins the phase-transform fidelity:
duals/working set/radii/penalty survive the toggle
(solver/phase.c:97-147), and the host path recovers the Wächter-Biegler
pathology in fewer iterations than a cold restart.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sleqp_tpu import Settings, Status
from sleqp_tpu.parallel.batch import batched_solve
from sleqp_tpu.problem_solver import initial_state
from sleqp_tpu.restoration import solve_with_restoration
from sleqp_tpu.solver import Solver

from fixtures import hs71_problem, wachbieg_problem

SETTINGS = Settings()


def _check_wachbieg_solution(x, atol=1e-6):
    assert x[2] >= -1e-8
    np.testing.assert_allclose(x[0], x[2] + 0.5, atol=atol)
    np.testing.assert_allclose(x[1], x[0] ** 2 - 1.0, atol=atol)


def test_solve_with_restoration_single():
    """One instance, jitted end-to-end including the restoration branch."""
    problem, x0, _ = wachbieg_problem()
    s0 = initial_state(problem, SETTINGS, x0)
    out = jax.jit(
        lambda s: solve_with_restoration(problem, SETTINGS, s, 200)
    )(s0)
    assert int(out.status) == Status.OPTIMAL, Status(int(out.status)).name
    _check_wachbieg_solution(np.asarray(out.it.x))


def test_batched_solve_with_restoration():
    """A batch mixing well-posed starts with the pathological one: every
    lane must finish OPTIMAL, with infeasible lanes recovering in-graph."""
    problem, x0, _ = wachbieg_problem()
    x0b = jnp.stack([
        x0,                             # needs restoration
        jnp.array([1.0, 0.0, 0.5]),    # at the solution set
        jnp.array([0.8, -0.4, 0.3]),   # benign
        x0 + jnp.array([0.0, 0.0, 1.0]),
    ])
    out = batched_solve(problem, SETTINGS, x0b, max_iterations=200,
                        restoration=True)
    statuses = np.asarray(out.status)
    assert (statuses == Status.OPTIMAL).all(), statuses
    for i in range(x0b.shape[0]):
        _check_wachbieg_solution(np.asarray(out.it.x[i]))


def test_restoration_flag_noop_on_feasible_batch():
    """With restoration on, a batch that never goes infeasible must return
    the same results as without it."""
    problem, x0, x_opt = hs71_problem()
    rng = np.random.default_rng(0)
    x0b = jnp.clip(
        x0[None, :] + jnp.asarray(rng.uniform(-0.05, 0.05, (4, 4))), 1.0, 5.0
    )
    plain = batched_solve(problem, SETTINGS, x0b, max_iterations=100)
    with_rest = batched_solve(
        problem, SETTINGS, x0b, max_iterations=100, restoration=True
    )
    np.testing.assert_array_equal(
        np.asarray(plain.status), np.asarray(with_rest.status)
    )
    np.testing.assert_allclose(
        np.asarray(plain.it.x), np.asarray(with_rest.it.x), rtol=0, atol=0
    )


def test_phase_toggle_preserves_solver_state():
    """Host path: after restoration the solve resumes with retained
    penalty/trust state and converges (phase.c:97-147 fidelity)."""
    problem, x0, _ = wachbieg_problem()
    solver = Solver(problem, x0)
    status = solver.solve(max_iterations=200)
    assert status == Status.OPTIMAL
    assert solver.num_phase_toggles >= 1
    _check_wachbieg_solution(solver.solution)
