"""Dynamic (inexact) function tests (reference: dyn_rosenbrock_fixture.c,
dyn_constrained_fixture.c + trial_point refinement loop)."""

import jax.numpy as jnp
import numpy as np

from sleqp_tpu import Problem, Settings, Status
from sleqp_tpu.dyn import DynFunc
from sleqp_tpu.problem_solver import solve


def _dyn_rosenbrock():
    """Rosenbrock with bound-controlled synthetic evaluation noise."""

    def true_obj(x):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    def eval_fn(x, error_bound, obj_weight, cons_weights):
        # weighted error = obj_weight * err_f must stay below the bound
        err_f = 0.5 * error_bound / jnp.maximum(obj_weight, 1.0)
        noisy = true_obj(x) + err_f * jnp.sin(37.0 * x[0] + 53.0 * x[1])
        estimate = obj_weight * err_f
        return noisy, jnp.zeros((0,)), estimate

    func = DynFunc(eval_fn, num_variables=2)
    return Problem(func), jnp.array([0.0, 0.0])


def _dyn_constrained():
    """Inexact quadratic objective with one exact-ish constraint."""

    def eval_fn(x, error_bound, obj_weight, cons_weights):
        denom = jnp.maximum(obj_weight + jnp.sum(cons_weights), 1.0)
        err = 0.4 * error_bound / denom
        obj = x[0] ** 2 + x[1] ** 2 + err * jnp.cos(17.0 * x[0])
        cons = jnp.array([x[0] + x[1] + err * jnp.sin(13.0 * x[1])])
        estimate = (obj_weight + jnp.sum(cons_weights)) * err
        return obj, cons, estimate

    func = DynFunc(eval_fn, num_variables=2, num_cons=1)
    problem = Problem(func, general_lb=1.0, general_ub=jnp.inf)
    return problem, jnp.array([2.0, 2.0])


def test_dyn_rosenbrock_solves():
    problem, x0 = _dyn_rosenbrock()
    state = solve(problem, Settings(), x0, max_iterations=500)
    assert int(state.status) == Status.OPTIMAL, Status(int(state.status)).name
    np.testing.assert_allclose(np.asarray(state.it.x), [1.0, 1.0], atol=1e-4)
    # the error bound must have been tightened below its initial value
    assert float(state.error_bound) < 1.0


def test_dyn_constrained_solves():
    problem, x0 = _dyn_constrained()
    state = solve(problem, Settings(), x0, max_iterations=500)
    assert int(state.status) == Status.OPTIMAL, Status(int(state.status)).name
    np.testing.assert_allclose(np.asarray(state.it.x), [0.5, 0.5], atol=1e-3)


def test_dyn_refinement_tightens_monotonically():
    problem, x0 = _dyn_rosenbrock()
    state = solve(problem, Settings(), x0, max_iterations=40)
    first_bound = float(state.error_bound)
    state2 = solve(problem, Settings(), x0, max_iterations=500)
    assert float(state2.error_bound) <= first_bound
