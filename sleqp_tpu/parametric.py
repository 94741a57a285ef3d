"""Parametric Cauchy: in-iteration LP trust-radius sweep.

TPU-native equivalent of src/main/parametric.c: starting from the LP step
at the current radius, either search *forward* (radius x2 coarse / xsqrt2
fine while the quadratic merit keeps strictly decreasing,
parametric.c:153-245) or *backtrack* (shrink until the Cauchy
sufficient-decrease condition holds, parametric.c:248-330), re-solving the
warm-started LP each time.  The accepted direction replaces the Cauchy
linesearch (full step), and the LP trust radius is updated in place.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .cauchy import CauchyResult, solve_cauchy_lp
from .iterate import Iterate, total_violation
from .merit import Direction, make_direction
from .problem import ProblemData
from .types import LPSolver, ParametricCauchy

Array = jax.Array

# parametric.c:78-88
_PARAMS = {
    ParametricCauchy.COARSE: (2.0, 0.5, 5),
    ParametricCauchy.FINE: (2.0**0.5, 0.5**0.5, 10),
}


def parametric_solve(
    mode: ParametricCauchy,
    data: ProblemData,
    it: Iterate,
    hess_prod: Callable[[Array], Array],
    penalty: Array,
    lp_trust_radius: Array,
    cres: CauchyResult,
    cauchy_eta: float,
    settings_eps: float,
    lp_solver: LPSolver = LPSolver.SIMPLEX,
    pdlp_tol: float = 1e-9,
    compute_dtype=None,
):
    """Returns (cres, lp_trust_radius, direction, quad_merit, full_step)."""
    increase, decrease, max_resolves = _PARAMS[mode]
    exact_violation = total_violation(data, it.cons_val)

    def direction_of(step: Array) -> Direction:
        return make_direction(it, step, hess_prod(step))

    def merit_and_decrease(d: Direction):
        lin_viol = total_violation(data, it.cons_val + d.cons_jac_dot)
        hess_dot = jnp.vdot(d.primal, d.hess)
        quad = (
            it.obj_val + d.obj_dot + penalty * lin_viol + 0.5 * hess_dot
        )
        sufficient = (
            penalty * (exact_violation - lin_viol) - d.obj_dot
        ) * (1.0 - cauchy_eta) >= 0.5 * hess_dot
        return quad, sufficient

    d0 = direction_of(cres.lp_step)
    quad0, sufficient0 = merit_and_decrease(d0)

    def resolve(radius, prev: CauchyResult) -> CauchyResult:
        return solve_cauchy_lp(
            data,
            it,
            radius,
            penalty,
            prev.basis,
            settings_eps=settings_eps,
            lp_solver=lp_solver,
            pdlp_tol=pdlp_tol,
            compute_dtype=compute_dtype,
        )

    def forward(_):
        # radius grows while the quadratic merit strictly improves
        def body(s):
            radius = s["radius"] * increase
            res = resolve(radius, s["cres"])
            d = direction_of(res.lp_step)
            quad, _ = merit_and_decrease(d)
            improved = quad < s["quad"] - settings_eps * (1.0 + jnp.abs(s["quad"]))
            count = s["count"] + 1
            keep = improved & (count < max_resolves)
            return dict(
                radius=jnp.where(improved, radius, s["radius"]),
                cres=jax.tree_util.tree_map(
                    lambda a, b: jnp.where(improved, a, b), res, s["cres"]
                ),
                direction=jax.tree_util.tree_map(
                    lambda a, b: jnp.where(improved, a, b), d, s["direction"]
                ),
                quad=jnp.where(improved, quad, s["quad"]),
                count=count,
                done=~keep,
            )

        init = dict(
            radius=lp_trust_radius,
            cres=cres,
            direction=d0,
            quad=quad0,
            count=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
        )
        out = lax.while_loop(lambda s: ~s["done"], body, init)
        return out["radius"], out["cres"], out["direction"], out["quad"]

    def backtrack(_):
        # radius shrinks until sufficient decrease holds
        def body(s):
            radius = s["radius"] * decrease
            res = resolve(radius, s["cres"])
            d = direction_of(res.lp_step)
            quad, sufficient = merit_and_decrease(d)
            count = s["count"] + 1
            done = sufficient | (count >= max_resolves)
            return dict(
                radius=radius,
                cres=res,
                direction=d,
                quad=quad,
                count=count,
                done=done,
            )

        init = dict(
            radius=lp_trust_radius,
            cres=cres,
            direction=d0,
            quad=quad0,
            count=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
        )
        out = lax.while_loop(lambda s: ~s["done"], body, init)
        return out["radius"], out["cres"], out["direction"], out["quad"]

    radius, out_cres, direction, quad = lax.cond(
        sufficient0, forward, backtrack, None
    )
    return out_cres, radius, direction, quad
