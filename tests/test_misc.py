"""Misc solver behaviors: unbounded detection, batched solves, settings.

Mirrors reference unbounded_test.c, thread_test.c (vmap analogue).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sleqp_tpu import Func, Problem, Settings, Status
from sleqp_tpu.parallel.batch import batched_solve
from sleqp_tpu.problem_solver import solve

from fixtures import hs71_problem, rosenbrock_problem


def test_unbounded_detection():
    """min -x with x free: objective dives below obj_lower."""
    func = Func(lambda x: -x[0], num_variables=1)
    problem = Problem(func)
    settings = Settings(obj_lower=-1e8)
    state = solve(problem, settings, jnp.zeros(1), max_iterations=2000)
    assert int(state.status) == Status.UNBOUNDED


def test_batched_independent_solves():
    """vmap analogue of the reference pthread test (thread_test.c:13-110):
    independent instances solved in one compiled program."""
    problem, x0, x_opt = hs71_problem()
    rng = np.random.default_rng(0)
    batch = 8
    x0b = jnp.clip(
        jnp.asarray(x0)[None, :]
        + jnp.asarray(rng.uniform(-0.1, 0.1, (batch, 4))),
        1.0,
        5.0,
    )
    states = batched_solve(problem, Settings(), x0b, max_iterations=100)
    assert np.all(np.asarray(states.status) == Status.OPTIMAL)
    for b in range(batch):
        np.testing.assert_allclose(
            np.asarray(states.it.x[b]), x_opt, atol=1e-4
        )


def test_batched_mixed_difficulty():
    """Instances terminating at different iterations coexist in a batch."""
    problem, x0, _ = rosenbrock_problem()
    x0b = jnp.asarray([[0.0, 0.0], [0.9, 0.8], [-1.0, 1.0], [1.0, 1.0]])
    states = batched_solve(problem, Settings(), x0b, max_iterations=200)
    assert np.all(np.asarray(states.status) == Status.OPTIMAL)
    iters = np.asarray(states.iteration)
    assert iters[3] < iters[0]  # started at the optimum vs far away


def test_float32_solve():
    """f32 fast path with relaxed tolerances (native TPU precision)."""
    def obj(x):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]

    def cons(x):
        return jnp.array([x[0] * x[1] * x[2] * x[3], jnp.vdot(x, x)])

    func = Func(obj, num_variables=4, cons=cons, num_cons=2)
    problem = Problem(
        func,
        var_lb=1.0,
        var_ub=5.0,
        general_lb=jnp.array([25.0, 40.0]),
        general_ub=jnp.array([jnp.inf, 40.0]),
        dtype=jnp.float32,
    )
    settings = Settings(
        feas_tol=1e-4, slack_tol=1e-4, stat_tol=1e-4, eps=1e-6, zero_eps=1e-12
    )
    x0 = jnp.array([1.0, 5.0, 5.0, 1.0], dtype=jnp.float32)
    state = solve(problem, settings, x0, max_iterations=100)
    assert int(state.status) == Status.OPTIMAL
    assert state.it.x.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(state.it.x), [1.0, 4.743, 3.82115, 1.37941], atol=1e-3
    )


def test_zero_func_degenerate():
    """Identically-zero objective (reference zero_func.c): every point is
    stationary; the solver must report OPTIMAL immediately instead of
    wandering or dividing by zero on the empty gradient."""
    func = Func(lambda x: jnp.asarray(0.0) * x[0], num_variables=2)
    problem = Problem(func, var_lb=-1.0, var_ub=1.0)
    x0 = jnp.array([0.25, -0.5])
    state = solve(problem, Settings(), x0, max_iterations=50)
    assert int(state.status) == Status.OPTIMAL
    assert int(state.iteration) <= 2
    np.testing.assert_allclose(np.asarray(state.it.x), np.asarray(x0))


def test_log_rosenbrock():
    """log(1 + 10^4 (y - x^2)^2 + (1 - x)^2) -> 0 at (1, 1)
    (reference log_rosenbrock_fixture.c): exercises a non-quadratic
    objective whose Hessian degenerates at the solution."""

    def obj(x):
        inner = 1.0 + 1e4 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
        return jnp.log(inner)

    func = Func(obj, num_variables=2)
    problem = Problem(func)
    state = solve(
        problem, Settings(), jnp.array([0.0, 0.0]), max_iterations=500
    )
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(
        np.asarray(state.it.x), [1.0, 1.0], atol=1e-3
    )
