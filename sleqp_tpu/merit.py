"""l1 exact-penalty merit function.

TPU-native equivalent of src/main/merit.c: φ(x) = f(x) + λ·v(x) with
v = total l1 violation of the combined constraints, plus the linear and
quadratic directional models used by the linesearches.

A ``Direction`` bundles (primal step d, ∇f·d, H·d, J·d) exactly like the
reference ``SleqpDirection`` (src/main/direction.c) so the merit models can
be evaluated without re-touching the problem functions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .iterate import Iterate, total_violation
from .problem import ProblemData

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Direction:
    """Step bundle kept consistent for merit math (direction.c:284)."""

    primal: Array  # (n,) step d
    obj_dot: Array  # scalar ∇f·d
    hess: Array  # (n,) H·d   (Hessian of Lagrangian at current multipliers)
    cons_jac_dot: Array  # (m,) J·d

    def scale(self, factor: Array) -> "Direction":
        return Direction(
            primal=self.primal * factor,
            obj_dot=self.obj_dot * factor,
            hess=self.hess * factor,
            cons_jac_dot=self.cons_jac_dot * factor,
        )

    @staticmethod
    def zero_like(other: "Direction") -> "Direction":
        return jax.tree_util.tree_map(jnp.zeros_like, other)


def make_direction(
    it: Iterate, primal: Array, hess_prod: Array
) -> Direction:
    """Build a consistent Direction from a primal step and its H·d product."""
    return Direction(
        primal=primal,
        obj_dot=jnp.vdot(it.obj_grad, primal),
        hess=hess_prod,
        cons_jac_dot=it.cons_jac @ primal,
    )


def merit_func(data: ProblemData, it: Iterate, penalty: Array) -> Array:
    """Exact merit φ(x) = f + λ·v(x) (merit.c:60-80 sleqp_merit_func)."""
    return it.obj_val + penalty * total_violation(data, it.cons_val)


def merit_linear(
    data: ProblemData, it: Iterate, direction: Direction, penalty: Array
) -> Array:
    """Linear model f + ∇f·d + λ·v(c + J·d) (merit.c:83-110)."""
    combined = it.cons_val + direction.cons_jac_dot
    return (
        it.obj_val
        + direction.obj_dot
        + penalty * total_violation(data, combined)
    )


def merit_quadratic(
    data: ProblemData, it: Iterate, direction: Direction, penalty: Array
) -> Array:
    """Quadratic model: linear + 0.5 d^T H d (merit.c:113-135)."""
    bilinear = jnp.vdot(direction.primal, direction.hess)
    return merit_linear(data, it, direction, penalty) + 0.5 * bilinear
