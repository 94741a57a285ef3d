"""Quick TPU experiment: fused vs stepped, f64 vs mixed vs f32.

Usage: python tools/tpu_probe.py [fused|stepped] [same|float32] [dtype] [batch]
Prints timing + solved count; exits nonzero on failure.
"""

import sys
import time

import numpy as np


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "stepped"
    compute = sys.argv[2] if len(sys.argv) > 2 else "same"
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float64"
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    max_iterations = int(sys.argv[5]) if len(sys.argv) > 5 else 60

    import jax

    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, ".")
    from bench import _make_problem, _x0_batch
    from sleqp_tpu import Settings, Status
    from sleqp_tpu.parallel.batch import batched_initial_state, batched_step
    from sleqp_tpu.problem_solver import solve_jit

    devs = [d for d in jax.devices() if d.platform != "cpu"]
    dev = devs[0] if devs else jax.devices("cpu")[0]
    print(f"device={dev} mode={mode} compute={compute} dtype={dtype} batch={batch}")

    problem, x0 = _make_problem()
    settings = Settings(compute_dtype=compute, dtype=dtype)
    with jax.default_device(dev):
        x0b = _x0_batch(x0, batch)
        state0 = batched_initial_state(problem, settings, x0b)
        if mode == "fused":
            fn = jax.jit(
                jax.vmap(lambda s: solve_jit(problem, settings, s, max_iterations))
            )
            t0 = time.perf_counter()
            out = fn(state0)
            jax.block_until_ready(out)
            print(f"compile+run: {time.perf_counter() - t0:.1f}s")
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(state0)
                jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps
        else:
            step = jax.jit(lambda s: batched_step(problem, settings, s))
            t0 = time.perf_counter()
            state = step(state0)
            jax.block_until_ready(state)
            print(f"compile+1step: {time.perf_counter() - t0:.1f}s")
            state = batched_initial_state(problem, settings, x0b)
            t0 = time.perf_counter()
            for _ in range(max_iterations):
                state = step(state)
            jax.block_until_ready(state)
            dt = time.perf_counter() - t0
            out = state
        iters = int(np.sum(np.asarray(out.iteration)))
        solved = int(np.sum(np.asarray(out.status) == Status.OPTIMAL))
        print(
            f"dt={dt:.3f}s iters={iters} solved={solved}/{batch} "
            f"rate={iters / dt:.1f} it/s"
        )


if __name__ == "__main__":
    main()
