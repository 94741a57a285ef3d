"""Trial-point rejection: accept_point predicate + non-finite guard.

TPU-native analogue of the reference's set_value reject flag
(pub_func.h:40-44) handled at problem_solver/iteration.c:416-456 (trial)
and :516-544 (SOC): a rejected evaluation discards the step like a merit
rejection and the trust radii shrink.  Under jit a user callback cannot
raise, so rejection is the traced ``Func.accept_point`` predicate, with
non-finite objective/constraint values rejected unconditionally
(python binding error tests: bindings/python/tests/func_error_test.py).
"""

import jax.numpy as jnp
import numpy as np

from sleqp_tpu import Func, Problem, Settings, Status
from sleqp_tpu.problem_solver import initial_state, perform_iteration, solve

SETTINGS = Settings()


def test_accept_point_rejects_region():
    """A predicate vetoing x0 > 0.5 must keep all accepted iterates out
    of the vetoed region while still converging to the (allowed)
    optimum."""

    def obj(x):
        return (x[0] - 0.4) ** 2 + x[1] ** 2

    func = Func(
        obj,
        num_variables=2,
        accept_point=lambda x: x[0] <= 0.5,
    )
    problem = Problem(func, var_lb=-10.0, var_ub=10.0)
    x0 = jnp.array([0.0, 3.0])
    state = solve(problem, SETTINGS, x0, max_iterations=100)
    assert int(state.status) == Status.OPTIMAL
    np.testing.assert_allclose(np.asarray(state.it.x), [0.4, 0.0], atol=1e-6)


def test_accept_point_rejection_shrinks_radius():
    """A single vetoed trial behaves like a merit rejection: the step is
    discarded and the trust radii shrink (iteration.c:587-599)."""

    def obj(x):
        return jnp.vdot(x, x)

    # veto everything except the starting point: every trial is rejected
    func = Func(
        obj,
        num_variables=2,
        accept_point=lambda x: jnp.all(x == jnp.array([2.0, 2.0])),
    )
    problem = Problem(func)
    x0 = jnp.array([2.0, 2.0])
    s = initial_state(problem, SETTINGS, x0)
    s1 = perform_iteration(problem, SETTINGS, s)
    assert int(s1.num_rejected) == 1
    assert float(s1.trust_radius) < float(s.trust_radius)
    np.testing.assert_array_equal(np.asarray(s1.it.x), np.asarray(x0))


def test_nonfinite_objective_rejected():
    """An objective producing nan outside a region must not poison the
    solve: non-finite trials are rejected unconditionally."""

    def obj(x):
        # nan for x0 < 0 (sqrt of negative), smooth quadratic otherwise
        return jnp.sqrt(x[0]) + (x[0] - 1.0) ** 2 + x[1] ** 2

    func = Func(obj, num_variables=2)
    problem = Problem(func, var_lb=jnp.array([-5.0, -5.0]), var_ub=5.0)
    x0 = jnp.array([4.0, 1.0])
    state = solve(problem, SETTINGS, x0, max_iterations=100)
    assert int(state.status) == Status.OPTIMAL
    assert bool(jnp.isfinite(state.it.obj_val))
    # optimum of sqrt(x0) + (x0-1)^2 on x0 >= 0 is at 2(x0-1) + 1/(2 sqrt(x0)) = 0
    assert float(state.it.x[0]) > 0.0
    np.testing.assert_allclose(float(state.it.x[1]), 0.0, atol=1e-6)


def test_nonfinite_constraint_rejected():
    def obj(x):
        return jnp.vdot(x, x)

    def cons(x):
        return jnp.array([jnp.log(x[0] + x[1])])  # nan/-inf when x0+x1 <= 0

    func = Func(obj, num_variables=2, cons=cons, num_cons=1)
    problem = Problem(
        func,
        general_lb=jnp.array([-1.0]),
        general_ub=jnp.array([jnp.inf]),
    )
    x0 = jnp.array([2.0, 2.0])
    state = solve(problem, SETTINGS, x0, max_iterations=100)
    assert int(state.status) == Status.OPTIMAL
    assert bool(jnp.all(jnp.isfinite(state.it.cons_val)))
    # optimum: x0 + x1 = exp(-1), symmetric
    np.testing.assert_allclose(
        float(state.it.x[0] + state.it.x[1]), np.exp(-1.0), atol=1e-5
    )
