"""Block-structured (OCP) front end: structured SQP through the
dual Schur-complement KKT path (sleqp_tpu/ocp.py, BASELINE config 4).

Cross-validation strategy: the same multistage problem is solved both by
the structured solver and — flattened into a plain equality-constrained
NLP — by the generic SQP solver; both must reach the same KKT point."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sleqp_tpu import Func, Problem, Settings, Status
from sleqp_tpu.ocp import (
    BlockStructuredProblem,
    ocp_initial_state,
    ocp_perform_iteration,
    ocp_solve,
)
from sleqp_tpu.problem_solver import solve as nlp_solve

T, NX, NU = 8, 2, 1
H_STEP = 0.1
X_INIT = jnp.array([1.0, 0.0])
X_GOAL = jnp.array([0.0, 0.0])


def _dynamics(x, u, t):
    """Damped nonlinear oscillator with control on velocity."""
    pos, vel = x[0], x[1]
    acc = -jnp.sin(pos) - 0.1 * vel + u[0]
    return jnp.array([pos + H_STEP * vel, vel + H_STEP * acc])


def _stage_cost(x, u, t):
    dx = x - X_GOAL
    return 0.5 * (jnp.vdot(dx, dx) + 0.1 * jnp.vdot(u, u))


def _final_cost(x):
    dx = x - X_GOAL
    return 5.0 * jnp.vdot(dx, dx)


def _make_ocp(**kwargs):
    return BlockStructuredProblem(
        _dynamics,
        _stage_cost,
        num_stages=T,
        num_states=NX,
        num_controls=NU,
        x0=X_INIT,
        final_cost=_final_cost,
        **kwargs,
    )


def _flat_problem(u_lb=None, u_ub=None, x_lb=None, x_ub=None):
    """The same OCP as a plain NLP: v = [x_1..x_T, u_0..u_{T-1}]."""
    n = T * NX + T * NU

    def split(v):
        X = jnp.concatenate([X_INIT[None], v[: T * NX].reshape(T, NX)])
        U = v[T * NX :].reshape(T, NU)
        return X, U

    def obj(v):
        X, U = split(v)
        ts = jnp.arange(T)
        return jnp.sum(jax.vmap(_stage_cost)(X[:-1], U, ts)) + _final_cost(
            X[-1]
        )

    def cons(v):
        X, U = split(v)
        ts = jnp.arange(T)
        return (jax.vmap(_dynamics)(X[:-1], U, ts) - X[1:]).reshape(-1)

    m = T * NX
    func = Func(obj, num_variables=n, cons=cons, num_cons=m)
    var_lb = None
    var_ub = None
    if u_lb is not None or x_lb is not None:
        xl = -jnp.inf if x_lb is None else x_lb
        xu = jnp.inf if x_ub is None else x_ub
        ul = -jnp.inf if u_lb is None else u_lb
        uu = jnp.inf if u_ub is None else u_ub
        var_lb = jnp.concatenate(
            [jnp.full((T * NX,), xl), jnp.full((T * NU,), ul)]
        )
        var_ub = jnp.concatenate(
            [jnp.full((T * NX,), xu), jnp.full((T * NU,), uu)]
        )
    problem = Problem(
        func,
        var_lb=var_lb,
        var_ub=var_ub,
        general_lb=jnp.zeros(m),
        general_ub=jnp.zeros(m),
    )
    return problem


def test_ocp_solves_to_kkt_point():
    ocp = _make_ocp()
    out = ocp_solve(ocp, max_iterations=50)
    assert int(out.status) == Status.OPTIMAL
    assert float(out.feas_res) <= 1e-6
    assert float(out.stat_res) <= 1e-6
    # rollout consistency: defects vanish at the solution
    np.testing.assert_allclose(
        np.asarray(ocp.residuals(out.X, out.U)), 0.0, atol=1e-6
    )


def test_ocp_matches_flat_nlp_solver():
    ocp = _make_ocp()
    out = ocp_solve(ocp, max_iterations=50)
    flat = _flat_problem()
    x0 = jnp.zeros((flat.num_variables,))
    ref = nlp_solve(flat, Settings(), x0, max_iterations=200)
    assert int(ref.status) == Status.OPTIMAL
    assert float(out.obj_val) == pytest.approx(
        float(ref.it.obj_val), rel=1e-5, abs=1e-7
    )
    U_ref = np.asarray(ref.it.x[T * NX :]).reshape(T, NU)
    np.testing.assert_allclose(np.asarray(out.U), U_ref, atol=1e-4)


def test_ocp_control_bounds_active_set():
    ub = 0.15  # tight enough that early controls saturate
    ocp = _make_ocp(u_lb=-ub, u_ub=ub)
    out = ocp_solve(ocp, max_iterations=80)
    assert int(out.status) == Status.OPTIMAL
    U = np.asarray(out.U)
    assert (U >= -ub - 1e-10).all() and (U <= ub + 1e-10).all()
    # cross-check against the generic solver with variable bounds
    flat = _flat_problem(u_lb=-ub, u_ub=ub)
    x0 = jnp.zeros((flat.num_variables,))
    ref = nlp_solve(flat, Settings(), x0, max_iterations=300)
    assert int(ref.status) == Status.OPTIMAL
    assert float(out.obj_val) == pytest.approx(
        float(ref.it.obj_val), rel=1e-5, abs=1e-7
    )
    # some bound must actually be active for this test to mean anything
    assert (np.abs(U) >= ub - 1e-8).any()


def test_ocp_state_bounds_active_set():
    """State bounds on x_1..x_T via the reduced-gradient freeze: the
    oscillator's velocity dips to ~-0.53 unconstrained; a lower bound
    of -0.45 must clip the dip and reach the bound's KKT point."""
    x_lb = jnp.array([-jnp.inf, -0.45])  # bound the velocity only
    ocp = _make_ocp(x_lb=x_lb)
    out = ocp_solve(ocp, max_iterations=120)
    assert int(out.status) == Status.OPTIMAL
    X = np.asarray(out.X)
    assert (X[1:, 1] >= -0.45 - 1e-10).all()
    # the bound must actually be active somewhere
    assert (X[1:, 1] <= -0.45 + 1e-6).any()
    # defects vanish at the solution (bounds respected by a feasible traj)
    np.testing.assert_allclose(
        np.asarray(ocp.residuals(out.X, out.U)), 0.0, atol=1e-6
    )
    # cross-check the objective against the generic solver
    flat = _flat_problem()  # bounds applied per-coordinate below
    import sleqp_tpu

    n = T * NX + T * NU
    var_lb = jnp.concatenate(
        [jnp.tile(x_lb, T), jnp.full((T * NU,), -jnp.inf)]
    )
    flatb = sleqp_tpu.Problem(
        flat.func,
        var_lb=var_lb,
        var_ub=jnp.full((n,), jnp.inf),
        general_lb=jnp.zeros(T * NX),
        general_ub=jnp.zeros(T * NX),
    )
    x0 = jnp.zeros((n,))
    ref = nlp_solve(flatb, Settings(), x0, max_iterations=300)
    assert int(ref.status) == Status.OPTIMAL
    assert float(out.obj_val) == pytest.approx(
        float(ref.it.obj_val), rel=1e-5, abs=1e-7
    )


def test_ocp_state_bounds_initial_clip():
    """A rollout that violates the state box is clipped at init."""
    ocp = _make_ocp(x_ub=jnp.array([0.8, jnp.inf]))  # rollout has pos 1.0
    state0 = ocp_initial_state(ocp, Settings())
    assert (np.asarray(state0.X[1:, 0]) <= 0.8 + 1e-12).all()


def test_ocp_gauss_newton_mode():
    ocp = _make_ocp(gauss_newton=True)
    out = ocp_solve(ocp, max_iterations=80)
    assert int(out.status) == Status.OPTIMAL
    ref = ocp_solve(_make_ocp(), max_iterations=50)
    assert float(out.obj_val) == pytest.approx(float(ref.obj_val), rel=1e-6)


def test_ocp_sharded_schur_matches_single_device():
    # stage count that does NOT divide the mesh (exercises padding)
    Tn = 19
    ocp = BlockStructuredProblem(
        _dynamics,
        _stage_cost,
        num_stages=Tn,
        num_states=NX,
        num_controls=NU,
        x0=X_INIT,
        final_cost=_final_cost,
    )
    single = ocp_solve(ocp, max_iterations=50)
    assert int(single.status) == Status.OPTIMAL

    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, axis_names=("stages",))
    sharded = ocp_solve(ocp, max_iterations=50, mesh=mesh)
    assert int(sharded.status) == Status.OPTIMAL
    np.testing.assert_allclose(
        np.asarray(sharded.U), np.asarray(single.U), atol=1e-8
    )
    assert int(sharded.iteration) == int(single.iteration)


def test_ocp_single_iteration_is_pure_and_jittable():
    ocp = _make_ocp()
    settings = Settings()
    s0 = ocp_initial_state(ocp, settings)
    step = jax.jit(lambda s: ocp_perform_iteration(ocp, settings, s))
    s1 = step(s0)
    s1b = step(s0)
    np.testing.assert_allclose(np.asarray(s1.U), np.asarray(s1b.U))
    assert int(s1.iteration) == 1
    # feasible rollout start: defects are zero, first step reduces the cost
    assert float(s0.feas_res) == np.inf  # unset before first linearization
    assert float(s1.obj_val) < float(s0.obj_val)


def test_ocp_scenario_batch():
    """vmapped independent structured solves over initial states."""
    from sleqp_tpu.ocp import batched_ocp_solve

    ocp = _make_ocp()
    x0s = jnp.stack(
        [X_INIT, X_INIT + jnp.array([0.3, -0.1]), X_INIT * 0.5]
    )
    out = batched_ocp_solve(ocp, Settings(), x0s, max_iterations=60)
    assert np.all(np.asarray(out.status) == Status.OPTIMAL)
    assert out.U.shape == (3, T, NU)
    # lane 0 must match the unbatched solve exactly
    single = ocp_solve(ocp, max_iterations=60)
    np.testing.assert_allclose(
        np.asarray(out.U[0]), np.asarray(single.U), atol=1e-10
    )
    # different scenarios genuinely differ
    assert float(np.abs(np.asarray(out.U[1] - out.U[0])).max()) > 1e-3


def test_ocp_mixed_precision_matches_f64():
    """compute_dtype="float32": float32 second-order assembly + KKT solve
    (delta-form QP around the current multiplier) must reach the same
    float64 KKT tolerances in essentially the same iterations — the TPU
    configuration (float64 is emulated on-chip)."""
    ocp = _make_ocp(u_lb=-2.0, u_ub=2.0)
    ref = ocp_solve(ocp, Settings(), max_iterations=50)
    out = ocp_solve(
        ocp, Settings(compute_dtype="float32"), max_iterations=50
    )
    assert int(ref.status) == Status.OPTIMAL
    assert int(out.status) == Status.OPTIMAL
    assert float(out.feas_res) <= 1e-6
    assert float(out.stat_res) <= 1e-6
    assert int(out.iteration) <= int(ref.iteration) + 3
    assert float(out.obj_val) == pytest.approx(
        float(ref.obj_val), rel=1e-6, abs=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.U), np.asarray(ref.U), atol=1e-5
    )
