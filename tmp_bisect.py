"""Bisect the axon/TPU XLA compile crash: compile components one at a time."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
from fixtures import hs71_problem

from sleqp_tpu import Settings, create_iterate
from sleqp_tpu.cauchy import empty_basis, solve_cauchy_lp

which = sys.argv[1]

problem, x0, _ = hs71_problem()
settings = Settings()

print("devices:", jax.devices())

if which == "cauchy":
    def f(x):
        it = create_iterate(problem, x)
        res = solve_cauchy_lp(
            problem.data,
            it,
            jnp.asarray(1.0),
            jnp.asarray(10.0),
            empty_basis(problem.num_variables, problem.num_cons),
        )
        return res.lp_step
    out = jax.jit(f)(x0)
    jax.block_until_ready(out)
    print("cauchy OK", out)
elif which.startswith("penalty"):
    from sleqp_tpu.penalty import update_penalty

    def f(x):
        it = create_iterate(problem, x)
        res = solve_cauchy_lp(
            problem.data,
            it,
            jnp.asarray(1.0),
            jnp.asarray(10.0),
            empty_basis(problem.num_variables, problem.num_cons),
        )
        from jax import lax

        def byrd(_):
            return update_penalty(
                problem.data, it, jnp.asarray(1.0), jnp.asarray(10.0), res
            )

        def keep(_):
            return jnp.asarray(10.0), res, jnp.asarray(False)

        if "cond" in which:
            pen, res2, changed = lax.cond(
                jnp.all(jnp.abs(x) < 100.0), keep, byrd, None
            )
        else:
            pen, res2, changed = byrd(None)
        return pen, res2.lp_step, changed
    out = jax.jit(f)(x0)
    jax.block_until_ready(out)
    print("penalty OK", out)
elif which in ("newton", "newton_gltr"):
    from sleqp_tpu.newton import compute_newton_step, compute_working_step
    from sleqp_tpu.ops.kkt import aug_jac_create

    def f(x):
        it = create_iterate(problem, x)
        res = solve_cauchy_lp(
            problem.data,
            it,
            jnp.asarray(1.0),
            jnp.asarray(10.0),
            empty_basis(problem.num_variables, problem.num_cons),
        )
        import dataclasses
        it2 = dataclasses.replace(
            it, var_states=res.var_states, cons_states=res.cons_states
        )
        aj = aug_jac_create(it2.cons_jac, it2.var_states, it2.cons_states)
        ws = compute_working_step(problem.data, it2, aj, jnp.asarray(1.0))

        def hess_prod(d):
            return problem.hess_prod(it2.x, d, res.cons_dual)

        nres = compute_newton_step(
            problem.data, it2, aj, ws, hess_prod, jnp.asarray(10.0), 20,
            use_gltr=(which == "newton_gltr"),
        )
        return nres
    out = jax.jit(f)(x0)
    jax.block_until_ready(out)
    print("newton OK")
elif which.startswith("iter_"):
    # full perform_iteration with settings toggles: iter_default,
    # iter_nosoc, iter_nonewton, iter_nolp (no resolves/warm start), ...
    import dataclasses as dc

    from sleqp_tpu.problem_solver import initial_state, perform_iteration

    mods = {}
    if "nosoc" in which:
        mods["perform_soc"] = False
    if "nonewton" in which:
        mods["perform_newton_step"] = False
    if "nolp" in which:
        mods["lp_resolves"] = False
        mods["always_warm_start_lp"] = False
        mods["lp_dual_warm_start"] = False
    if "noquad" in which:
        mods["use_quadratic_model"] = False
    if "lpdual" in which:
        from sleqp_tpu.types import DualEstimationType
        mods["dual_estimation_type"] = DualEstimationType.LP
    s = dc.replace(settings, **mods)
    state0 = initial_state(problem, s, x0)
    out = jax.jit(lambda st: perform_iteration(problem, s, st))(state0)
    jax.block_until_ready(out)
    print(which, "OK; iteration ->", int(out.iteration))
elif which == "iterate":
    def f(x):
        it = create_iterate(problem, x)
        return it.obj_val, it.cons_val
    out = jax.jit(f)(x0)
    jax.block_until_ready(out)
    print("iterate OK", out)
