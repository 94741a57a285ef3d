"""Step acceptance rules: direct, window, minstep.

TPU-native equivalent of src/main/step/ (step_rule_direct.c,
step_rule_window.c, step_rule_minstep.c): the nonmonotone rules keep
fixed-shape state inside the jitted solver:

* WINDOW (window 25, step_rule.c:13): ring buffer of accepted
  (exact merit, model reduction); historic ratio
  (max windowed merit - trial) / (sum of model reductions since that
  max + current) (step_rule_window.c:78-117)
* MINSTEP (step count 2, step_rule.c:14): watermark rule with reference/
  max merits and model-decrease sums (step_rule_minstep.c)

The final ratio is max(current, historic); accept if >= accepted_reduction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .types import StepRule

Array = jax.Array

WINDOW_SIZE = 25  # step_rule.c:13
MINSTEP_COUNT = 2  # step_rule.c:14


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepRuleState:
    """Union state for all rules (unused parts stay at defaults)."""

    # window rule ring buffer (newest at index len-1 semantics via roll)
    merits: Array  # (W,)
    reductions: Array  # (W,)
    length: Array  # int32 valid entries
    # minstep watermarks
    init: Array  # bool
    min_merit: Array
    ref_merit: Array
    max_merit: Array
    decrease_sum_ref: Array
    decrease_sum_max: Array
    step_count: Array  # int32


def step_rule_init(rule: StepRule, dtype) -> StepRuleState:
    W = WINDOW_SIZE if rule == StepRule.WINDOW else 0
    zero = jnp.asarray(0.0, dtype=dtype)
    return StepRuleState(
        merits=jnp.full((W,), -jnp.inf, dtype=dtype),
        reductions=jnp.zeros((W,), dtype=dtype),
        length=jnp.asarray(0, jnp.int32),
        init=jnp.asarray(False),
        min_merit=zero,
        ref_merit=zero,
        max_merit=zero,
        decrease_sum_ref=zero,
        decrease_sum_max=zero,
        step_count=jnp.asarray(0, jnp.int32),
    )


def _ratio(exact_reduction: Array, model_reduction: Array) -> Array:
    same = exact_reduction == model_reduction
    return jnp.where(
        same, 1.0, exact_reduction / jnp.where(same, 1.0, model_reduction)
    )


def apply_step_rule(
    rule: StepRule,
    state: StepRuleState,
    iterate_merit: Array,
    trial_exact_merit: Array,
    trial_model_merit: Array,
    accepted_reduction: float,
):
    """Returns (accept, reduction_ratio, state_for_accept, state_for_reject).

    The caller picks the post state depending on the final accept decision
    (which may involve SOC re-application with a different trial merit).
    """
    exact_reduction = iterate_merit - trial_exact_merit
    model_reduction = iterate_merit - trial_model_merit
    current = _ratio(exact_reduction, model_reduction)

    if rule == StepRule.DIRECT:
        from .problem_solver import _reduction_ratio

        ratio = _reduction_ratio(exact_reduction, model_reduction)
        accept = ratio >= accepted_reduction
        return accept, ratio, state, state

    if rule == StepRule.WINDOW:
        W = WINDOW_SIZE
        # historic ratio: reference index = argmax of windowed merits
        has_hist = state.length > 0
        ref_idx = jnp.argmax(state.merits)
        ref_merit = state.merits[ref_idx]
        idx = jnp.arange(W)
        # sum of model reductions from ref_idx (inclusive) to end
        tail_sum = jnp.sum(jnp.where(idx >= ref_idx, state.reductions, 0.0))
        hist = (ref_merit - trial_exact_merit) / (tail_sum + model_reduction)
        use_hist = has_hist & (ref_merit >= trial_exact_merit)
        ratio = jnp.where(use_hist, jnp.maximum(current, hist), current)
        accept = ratio >= accepted_reduction

        new_merits = jnp.roll(state.merits, -1).at[-1].set(iterate_merit)
        new_reds = jnp.roll(state.reductions, -1).at[-1].set(
            jnp.maximum(model_reduction, 0.0)
        )
        accept_state = dataclasses.replace(
            state,
            merits=new_merits,
            reductions=new_reds,
            length=jnp.minimum(state.length + 1, W),
        )
        return accept, ratio, accept_state, state

    assert rule == StepRule.MINSTEP
    # lazily initialize watermarks at the current merit
    ref = jnp.where(state.init, state.ref_merit, iterate_merit)
    mn = jnp.where(state.init, state.min_merit, iterate_merit)
    mx = jnp.where(state.init, state.max_merit, iterate_merit)
    dec_ref = jnp.where(state.init, state.decrease_sum_ref, 0.0)
    dec_max = jnp.where(state.init, state.decrease_sum_max, 0.0)
    count = jnp.where(state.init, state.step_count, 0)

    hist = (ref - trial_exact_merit) / (dec_ref + model_reduction)
    ratio = jnp.maximum(current, hist)
    accept = ratio >= accepted_reduction

    # accepted bookkeeping (step_rule_minstep.c:118-168)
    dec_ref_acc = dec_ref + model_reduction
    dec_max_acc = dec_max + model_reduction
    new_min = iterate_merit < mn
    mn_acc = jnp.where(new_min, iterate_merit, mn)
    mx_acc = jnp.where(new_min, iterate_merit, mx)
    dec_ref_acc = jnp.where(new_min, 0.0, dec_ref_acc)
    dec_max_acc = jnp.where(new_min, 0.0, dec_max_acc)
    count_acc = jnp.where(new_min, 0, count + 1)

    new_max = (~new_min) & (iterate_merit > mx_acc)
    mx_acc = jnp.where(new_max, iterate_merit, mx_acc)
    dec_max_acc = jnp.where(new_max, 0.0, dec_max_acc)

    hit_limit = count_acc == MINSTEP_COUNT
    ref_acc = jnp.where(hit_limit, mx_acc, ref)
    dec_ref_acc = jnp.where(hit_limit, dec_max_acc, dec_ref_acc)

    accept_state = StepRuleState(
        merits=state.merits,
        reductions=state.reductions,
        length=state.length,
        init=jnp.asarray(True),
        min_merit=mn_acc,
        ref_merit=ref_acc,
        max_merit=mx_acc,
        decrease_sum_ref=dec_ref_acc,
        decrease_sum_max=dec_max_acc,
        step_count=count_acc,
    )
    reject_state = dataclasses.replace(
        state,
        init=jnp.asarray(True),
        min_merit=mn,
        ref_merit=ref,
        max_merit=mx,
        decrease_sum_ref=dec_ref,
        decrease_sum_max=dec_max,
        step_count=count,
    )
    return accept, ratio, accept_state, reject_state
