"""Batched and sharded NLP solves.

TPU-native replacement for the reference's process-level parallelism
(src/test/thread_test.c: independent solvers on pthreads;
sleqp_cutest_main.c:186-229: fork-per-problem): here a *batch of problem
instances* with identical shapes is vmapped into one XLA program, and
scenario batches scale across a device mesh with `shard_map` + psum
consensus reductions (BASELINE configs 2 and 5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..problem import Problem
from ..problem_solver import (
    SolverState,
    initial_state,
    perform_iteration,
    solve_jit,
)
from ..settings import Settings
from ..types import Status

Array = jax.Array


def batched_initial_state(
    problem: Problem, settings: Settings, x0_batch: Array
) -> SolverState:
    """vmap of initial_state over a (B, n) batch of starting points."""
    return jax.vmap(lambda x0: initial_state(problem, settings, x0))(x0_batch)


def batched_solve(
    problem: Problem,
    settings: Settings,
    x0_batch: Array,
    max_iterations: int = 1000,
    restoration: bool = False,
) -> SolverState:
    """Solve B instances of the same problem shape in one compiled program.

    Each instance runs its own while_loop trip count; XLA executes the
    batch in lockstep until every instance terminates (vmap of while_loop
    masks finished lanes).

    With ``restoration``, lanes that hit LOCALLY_INFEASIBLE get one
    in-graph restoration attempt and resume (restoration.py
    solve_with_restoration); costs nothing at runtime when no lane needs
    it (status-masked while_loops).
    """
    state0 = batched_initial_state(problem, settings, x0_batch)
    if restoration and problem.num_cons > 0:
        from ..restoration import (
            make_restoration_problem,
            solve_with_restoration,
        )

        rest_problem = make_restoration_problem(problem)
        return jax.vmap(
            lambda s: solve_with_restoration(
                problem, settings, s, max_iterations, rest_problem
            )
        )(state0)
    return jax.vmap(
        lambda s: solve_jit(problem, settings, s, max_iterations)
    )(state0)


def batched_step(
    problem: Problem, settings: Settings, states: SolverState
) -> SolverState:
    """One synchronized SQP iteration across a batch (for benchmarking)."""
    return jax.vmap(lambda s: perform_iteration(problem, settings, s))(states)


def sharded_solve(
    problem: Problem,
    settings: Settings,
    x0_batch: Array,
    mesh: Mesh,
    axis_name: str = "batch",
    max_iterations: int = 1000,
    restoration: bool = False,
) -> SolverState:
    """Scenario-batched solve across a device mesh.

    The instance batch is sharded over ``axis_name``; every device solves
    its shard with the jitted while_loop, and a final psum-style consensus
    collects the global solved count (the cross-host reduction pattern of
    BASELINE config 5: ICI/DCN collectives instead of MPI).

    Returns the solved states (sharded) — callers read
    ``jnp.sum(status == OPTIMAL)`` etc. without further communication.
    """
    batch = x0_batch.shape[0]
    n_dev = mesh.devices.size
    if batch % n_dev != 0:
        raise ValueError(f"batch {batch} not divisible by mesh size {n_dev}")

    state0 = batched_initial_state(problem, settings, x0_batch)

    if restoration and problem.num_cons > 0:
        from ..restoration import (
            make_restoration_problem,
            solve_with_restoration,
        )

        rest_problem = make_restoration_problem(problem)

        def solve_one(s):
            return solve_with_restoration(
                problem, settings, s, max_iterations, rest_problem
            )
    else:

        def solve_one(s):
            return solve_jit(problem, settings, s, max_iterations)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(axis_name), state0),),
        out_specs=(
            jax.tree_util.tree_map(lambda _: P(axis_name), state0),
            P(),
        ),
        check_vma=False,
    )
    def run(shard_state):
        out = jax.vmap(solve_one)(shard_state)
        solved_local = jnp.sum(
            (out.status == Status.OPTIMAL).astype(jnp.int32)
        )
        solved_global = jax.lax.psum(solved_local, axis_name)
        return out, solved_global

    return run(state0)
