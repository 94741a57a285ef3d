"""Checkpoint/resume: a resumed solve continues exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from sleqp_tpu import Settings, Status
from sleqp_tpu.checkpoint import load_state, save_state
from sleqp_tpu.problem_solver import initial_state, perform_iteration, solve_jit

from fixtures import hs71_problem


def test_save_load_roundtrip(tmp_path):
    problem, x0, _ = hs71_problem()
    settings = Settings()
    state = initial_state(problem, settings, x0)
    step = jax.jit(lambda s: perform_iteration(problem, settings, s))
    for _ in range(3):
        state = step(state)

    path = str(tmp_path / "ckpt")
    save_state(state, path)
    restored = load_state(state, path)

    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_matches_uninterrupted(tmp_path):
    problem, x0, _ = hs71_problem()
    settings = Settings()

    # uninterrupted reference run
    full = solve_jit(
        problem, settings, initial_state(problem, settings, x0), 100
    )

    # interrupted at iteration 4, checkpointed, resumed
    state = initial_state(problem, settings, x0)
    step = jax.jit(lambda s: perform_iteration(problem, settings, s))
    for _ in range(4):
        state = step(state)
    path = str(tmp_path / "ckpt")
    save_state(state, path)
    resumed = load_state(state, path)
    final = solve_jit(problem, settings, resumed, 100)

    assert int(final.status) == Status.OPTIMAL
    np.testing.assert_allclose(
        np.asarray(final.it.x), np.asarray(full.it.x), atol=1e-12
    )
    assert int(final.iteration) == int(full.iteration)
