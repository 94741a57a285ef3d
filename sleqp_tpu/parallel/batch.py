"""Batched and sharded NLP solves.

TPU-native replacement for the reference's process-level parallelism
(src/test/thread_test.c: independent solvers on pthreads;
sleqp_cutest_main.c:186-229: fork-per-problem): here a *batch of problem
instances* with identical shapes is vmapped into one XLA program, and
scenario batches scale across a device mesh with `shard_map` + psum
consensus reductions (BASELINE configs 2 and 5).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

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


@lru_cache(maxsize=64)
def _f32_problem(problem: Problem) -> Problem:
    """Cached float32 clone: Problem hashes by identity, so rebuilding
    the clone per call would miss solve_jit's static-argument cache and
    recompile the phase-1 program on every solve."""
    return problem.astype(jnp.float32)


@lru_cache(maxsize=64)
def _mp_phase2_fn(problem: Problem, settings: Settings, polish_iterations: int):
    """Cached jitted phase-2 (f64 polish) program.

    Built once per (problem, settings, budget): rebuilding
    ``jax.jit(jax.vmap(...))`` per call would create a fresh jit cache
    entry and recompile the polish program on EVERY solve (measured 180s
    per call on the remote TPU)."""
    import dataclasses

    dtype = problem.dtype
    min_radius = 1e-4  # don't inherit a nearly-collapsed radius

    def warm_one(ok, s32, x0):
        x64 = problem.clip_to_bounds(s32.it.x.astype(dtype))
        fresh = initial_state(problem, settings, jnp.where(ok, x64, x0))
        warm = dataclasses.replace(
            fresh,
            penalty=s32.penalty.astype(dtype),
            trust_radius=jnp.maximum(
                s32.trust_radius.astype(dtype), min_radius
            ),
            lp_trust_radius=jnp.maximum(
                s32.lp_trust_radius.astype(dtype), min_radius
            ),
            basis=s32.basis,  # int arrays — dtype-independent
        )
        state0 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), warm, fresh
        )
        out = solve_jit(problem, settings, state0, polish_iterations)
        return dataclasses.replace(
            out, iteration=out.iteration + s32.iteration
        )

    return jax.jit(jax.vmap(warm_one))


def batched_solve_mp(
    problem: Problem,
    settings: Settings,
    x0_batch: Array,
    max_iterations: int = 1000,
    coarse_tol: float = 2e-3,
    coarse_iterations: int = 20,
    polish_iterations: int = 12,
) -> SolverState:
    """Two-phase mixed-precision batched solve (BASELINE config 2 fast path).

    Phase 1 solves every instance end-to-end in hardware-native float32
    to ``coarse_tol``; phase 2 re-solves in the problem dtype
    warm-started from the float32 result (iterate, penalty, trust radii,
    LP basis), which takes only a few iterations near a solution.  TPUs
    emulate float64 in software, so moving the bulk of the SQP
    iterations into float32 is the dominant throughput lever — the same
    escalation pattern as ``Settings.compute_dtype`` (f32 inner loops +
    f64 certification), applied to the WHOLE iteration.  All certified
    quantities (KKT residuals, duals, the convergence test) come from
    the float64 phase, so the returned state meets the full float64
    tolerances exactly as ``batched_solve`` does.

    Lanes whose float32 phase fails restart phase 2 from their original
    starting point with fresh radii (no warm start from a broken state).
    ``iteration`` on the returned state counts BOTH phases (total SQP
    iterations executed per instance).

    ``coarse_tol`` sits well above the float32 KKT noise floor — near
    the solution the float32 phase oscillates (merit differences at
    rounding level make the reduction ratio garbage), so pushing it
    below ~1e-3 burns iterations without improving the warm start;
    ``coarse_iterations`` caps the phase for the same reason.
    ``polish_iterations`` caps phase 2: a warm-started lane needs only a
    handful of f64 iterations, and the vmapped while_loop runs until the
    SLOWEST lane finishes — one cold lane must not make the whole batch
    pay the full f64 budget (the rare lane that genuinely needs more
    reports non-optimal and can be re-solved individually).

    Reference: no equivalent — SLEQP is double-precision throughout
    (src/main: all ``double``); this is TPU-native design space.
    """
    import dataclasses

    from ..dyn import DynFunc
    from ..types import f32_compute_scope

    dtype = problem.dtype
    if isinstance(problem.func, DynFunc) or jnp.dtype(dtype) == jnp.float32:
        # dynamic functions certify against error bounds that float32
        # cannot represent faithfully; plain f32 problems have no second
        # phase to run
        return batched_solve(problem, settings, x0_batch, max_iterations)

    problem32 = _f32_problem(problem)
    settings32 = dataclasses.replace(
        settings,
        dtype="float32",
        compute_dtype="same",
        feas_tol=max(settings.feas_tol, coarse_tol),
        stat_tol=max(settings.stat_tol, coarse_tol),
        slack_tol=max(settings.slack_tol, coarse_tol),
        # Phase 1 is only a warm-start generator; under vmap every
        # lax.cond lowers to a select that evaluates BOTH branches for
        # every lane, so optional branches (the SOC second evaluation +
        # min-norm solve, the Byrd-update LP resolve) are paid on every
        # iteration whether used or not — strip them here.  Phase 2
        # keeps the faithful reference behavior and issues the
        # certificate.
        perform_soc=False,
        lp_resolves=False,
    )
    with f32_compute_scope():
        # traced inside the scope so float64 constants closed over by the
        # user's callables demote to float32 for this phase only
        st32 = batched_solve(
            problem32,
            settings32,
            x0_batch.astype(jnp.float32),
            min(coarse_iterations, max_iterations),
        )

    ok32 = st32.status == Status.OPTIMAL
    phase2 = _mp_phase2_fn(
        problem, settings, min(polish_iterations, max_iterations)
    )
    return phase2(ok32, st32, x0_batch)


def batched_solve_chunked(
    problem: Problem,
    settings: Settings,
    x0_batch: Array,
    max_iterations: int = 1000,
    chunk_size: int = 1024,
    mp: bool = False,
) -> SolverState:
    """Solve an arbitrarily large instance batch in chunks of at most
    ``chunk_size``.

    The remote TPU worker crashes ("kernel fault") on single fused
    programs beyond ~1024 fused instances (CLAUDE.md known state); this
    driver keeps each XLA program at ``chunk_size`` lanes and runs
    chunks sequentially — one compile, reused across chunks (the last
    chunk is padded to the same shape so nothing retraces).  Throughput
    equals the chunk-level throughput; padding lanes are dropped from
    the returned state.

    ``mp=True`` routes each chunk through the two-phase
    mixed-precision solver (batched_solve_mp).
    """
    B = x0_batch.shape[0]
    if B <= chunk_size:
        solve = batched_solve_mp if mp else batched_solve
        return solve(problem, settings, x0_batch, max_iterations)
    pad = (-B) % chunk_size
    if pad:
        x0_batch = jnp.concatenate(
            [x0_batch, jnp.tile(x0_batch[-1:], (pad, 1))], axis=0
        )
    solve = batched_solve_mp if mp else batched_solve
    outs = [
        solve(
            problem,
            settings,
            x0_batch[i : i + chunk_size],
            max_iterations,
        )
        for i in range(0, B + pad, chunk_size)
    ]
    full = jax.tree_util.tree_map(
        lambda *leaves: jnp.concatenate(leaves, axis=0), *outs
    )
    return jax.tree_util.tree_map(lambda a: a[:B], full)


def multistart_solve(
    problem: Problem,
    settings: Settings,
    x0: Array,
    num_starts: int = 8,
    radius: float = 0.5,
    seed: int = 0,
    max_iterations: int = 1000,
) -> SolverState:
    """Batched multistart: solve from ``num_starts`` jittered copies of
    ``x0`` (clipped to the variable box) in one vmapped program and
    return the best lane — lowest objective among OPTIMAL lanes, or the
    lowest-violation lane if none converged.

    A local SQP method converges to the nearest KKT point (e.g. hs33's
    alternate local minimum, PARITY.md §7); multistart is the standard
    escape, and on an accelerator the extra starts ride the same batch
    dimension the instance-batching path already uses (vmap of
    solve_jit) — num_starts solves cost roughly one solve of wall time.
    Reference: no equivalent (single-start driver, solve.c:95).
    """
    n = problem.num_variables
    key = jax.random.PRNGKey(seed)
    jitter = radius * jax.random.uniform(
        key, (num_starts, n), minval=-1.0, maxval=1.0, dtype=x0.dtype
    )
    starts = jnp.concatenate(
        [x0[None, :], x0[None, :] + jitter[1:]], axis=0
    )
    starts = jax.vmap(problem.clip_to_bounds)(starts)
    out = batched_solve(problem, settings, starts, max_iterations)
    ok = out.status == Status.OPTIMAL
    # best = argmin objective among converged lanes; else min violation
    obj = jnp.where(ok, out.it.obj_val, jnp.inf)
    best_ok = jnp.argmin(obj)
    best_fallback = jnp.argmin(out.feas_res)
    idx = jnp.where(jnp.any(ok), best_ok, best_fallback)
    return jax.tree_util.tree_map(lambda a: a[idx], out)


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
