"""Post-solve working-set polishing.

TPU-native equivalent of src/main/polish.c: after the solve, drop
working-set entries that carry no information —

* ZERO_DUAL (default): active entries with zero dual become INACTIVE
  (polish.c:129-236)
* INACTIVE: additionally drop entries whose primal value is not actually
  at the corresponding bound (polish.c:43-127)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iterate import Iterate
from .problem import ProblemData
from .types import ActiveState, Polishing

Array = jax.Array


def _polish_zero_dual(states: Array, dual: Array) -> Array:
    return jnp.where(
        (states != ActiveState.INACTIVE) & (dual == 0.0),
        ActiveState.INACTIVE,
        states,
    ).astype(jnp.int8)


def _polish_inactive(
    states: Array, value: Array, lb: Array, ub: Array, eps: float
) -> Array:
    # Guard against infinite bounds: |value - (-inf)| <= eps*(1+inf) would
    # evaluate inf <= inf == True and wrongly keep the entry active.
    at_lower = jnp.isfinite(lb) & (jnp.abs(value - lb) <= eps * (1.0 + jnp.abs(lb)))
    at_upper = jnp.isfinite(ub) & (jnp.abs(value - ub) <= eps * (1.0 + jnp.abs(ub)))
    keep = jnp.where(
        states == ActiveState.ACTIVE_LOWER,
        at_lower,
        jnp.where(
            states == ActiveState.ACTIVE_UPPER,
            at_upper,
            jnp.where(states == ActiveState.ACTIVE_BOTH, at_lower | at_upper, False),
        ),
    )
    return jnp.where(keep, states, ActiveState.INACTIVE).astype(jnp.int8)


def polish_iterate(
    data: ProblemData, it: Iterate, polishing: Polishing, eps: float = 1e-10
) -> Iterate:
    """Apply the selected polishing to the working set (polish.c:238-268)."""
    import dataclasses

    if polishing == Polishing.NONE:
        return it
    var_states = _polish_zero_dual(it.var_states, it.vars_dual)
    cons_states = _polish_zero_dual(it.cons_states, it.cons_dual)
    if polishing == Polishing.INACTIVE:
        var_states = _polish_inactive(
            var_states, it.x, data.var_lb, data.var_ub, eps
        )
        cons_states = _polish_inactive(
            cons_states, it.cons_val, data.cons_lb, data.cons_ub, eps
        )
    return dataclasses.replace(
        it, var_states=var_states, cons_states=cons_states
    )
