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


def test_scaled_dyn_weights():
    """Scaling a DynFunc scales the error weights on the way in and the
    values on the way out (problem_scaling.c:276-345, scale.c:269-340)."""
    from sleqp_tpu.scale import ScaledProblem, Scaling

    seen = {}

    def eval_fn(x, error_bound, obj_weight, cons_weights):
        # encode received weights into the error estimate so the test can
        # observe them through the public surface
        seen["w"] = (obj_weight, cons_weights)
        obj = x[0] ** 2
        cons = jnp.array([x[0] + x[1]])
        return obj, cons, obj_weight * 0.0

    func = DynFunc(eval_fn, num_variables=2, num_cons=1)
    problem = Problem(func, general_lb=1.0, general_ub=jnp.inf)

    scaling = Scaling(2, 1, obj_weight=3)  # f scaled by 2^-3
    scaling.cons_weights = np.array([2], dtype=np.int32)  # c scaled by 2^-2
    sp = ScaledProblem(problem, scaling)

    assert isinstance(sp.func, DynFunc)
    obj, cons, err = sp.func.eval_at(
        jnp.array([2.0, 0.0]), jnp.asarray(1e-2), penalty=jnp.asarray(80.0)
    )
    w_f, w_c = seen["w"]
    # solver-side obj weight 1 arrives as 2^-3; penalty 80 as 80 * 2^-2
    np.testing.assert_allclose(float(w_f), 0.125)
    np.testing.assert_allclose(np.asarray(w_c), [20.0])
    # values scaled on the way out
    np.testing.assert_allclose(float(obj), 4.0 * 0.125)
    np.testing.assert_allclose(np.asarray(cons), [0.5])


def test_scaled_dyn_solve_weight_magnitudes():
    """End-to-end: a scaled dynamic solve where the constraint weights
    span orders of magnitude still converges and tightens the bound."""
    from sleqp_tpu.scale import ScaledProblem, Scaling

    def eval_fn(x, error_bound, obj_weight, cons_weights):
        denom = jnp.maximum(obj_weight + jnp.sum(cons_weights), 1e-8)
        err = 0.4 * error_bound / denom
        obj = x[0] ** 2 + x[1] ** 2 + err * jnp.cos(17.0 * x[0])
        cons = jnp.array([x[0] + x[1] + err * jnp.sin(13.0 * x[1])])
        estimate = (obj_weight + jnp.sum(cons_weights)) * err
        return obj, cons, estimate

    func = DynFunc(eval_fn, num_variables=2, num_cons=1)
    problem = Problem(func, general_lb=1.0, general_ub=jnp.inf)

    scaling = Scaling(2, 1, obj_weight=4)  # f scaled by 2^-4
    scaling.cons_weights = np.array([-2], dtype=np.int32)  # c by 2^2
    # inner weights then span w_f = 2^-4 vs w_c = 4*penalty: ~3 orders
    sp = ScaledProblem(problem, scaling)

    x0s = sp.scale_point(jnp.array([2.0, 2.0]))
    state = solve(sp, Settings(), x0s, max_iterations=500)
    assert int(state.status) == Status.OPTIMAL, Status(int(state.status)).name
    x = np.asarray(sp.unscale_point(state.it.x))
    np.testing.assert_allclose(x, [0.5, 0.5], atol=1e-3)
    assert float(state.error_bound) < 1.0
