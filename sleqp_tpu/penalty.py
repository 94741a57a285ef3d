"""Byrd-style penalty parameter update.

TPU-native equivalent of src/main/penalty.c: compare the current average
linearized violation with the best achievable (FEAS-objective LP re-solve);
increase the penalty x10 (up to 100 times) re-solving the MIXED LP until the
violation reduction is acceptable.  The whole procedure is one
`lax.while_loop` around the simplex (LP re-solves warm-start from the
previous basis, mirroring the reference per-objective saved bases,
standard_cauchy.c:843-946).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .cauchy import CauchyResult, solve_cauchy_lp
from .iterate import Iterate
from .problem import ProblemData
from .types import LPSolver

Array = jax.Array

PENALTY_INCREASE = 10.0  # penalty.c:6
VIOLATION_TOL = 1e-8  # penalty.c:7
MIN_DECREASE = 0.1  # penalty.c:8
MAX_INCREASES = 100  # penalty.c:9


def update_penalty(
    data: ProblemData,
    it: Iterate,
    lp_trust_radius: Array,
    penalty: Array,
    current: CauchyResult,
    lp_solver: LPSolver = LPSolver.SIMPLEX,
    pdlp_tol: float = 1e-9,
    compute_dtype=None,
) -> tuple[Array, CauchyResult, Array]:
    """Returns (new_penalty, cauchy_result_at_new_penalty, changed).

    When the penalty changes, the returned CauchyResult is the MIXED-LP
    solve at the final penalty value (the caller re-extracts step/working
    set from it, trial_point/cauchy_step.c:150-166).
    """
    m = it.cons_val.shape[0]
    assert m > 0

    cur_viol = current.violation / m

    def solve_at(pen, basis, feas):
        # MIXED/FEAS re-solves never trigger the reduced resolve
        # (reference: standard_cauchy.c:932-945, DEFAULT objective only)
        return solve_cauchy_lp(
            data,
            it,
            lp_trust_radius,
            pen,
            basis,
            feasibility_mode=feas,
            lp_resolves=False,
            lp_solver=lp_solver,
            pdlp_tol=pdlp_tol,
            compute_dtype=compute_dtype,
        )

    def no_change(_):
        return penalty, current, jnp.asarray(False)

    def do_update(_):
        feas_res = solve_at(penalty, current.basis, True)
        inf_viol = feas_res.violation / m
        achievable = inf_viol <= VIOLATION_TOL
        # If even the best violation is above tolerance and we cannot make
        # progress, keep the penalty (penalty.c:100-110).
        stuck = (~achievable) & (cur_viol - inf_viol <= VIOLATION_TOL)

        def increase_loop(_):
            def cond(s):
                return ~s["done"]

            def body(s):
                pen = s["penalty"] * PENALTY_INCREASE
                res = solve_at(pen, s["result"].basis, False)
                next_viol = res.violation / m
                ok = jnp.where(
                    achievable,
                    next_viol <= VIOLATION_TOL,
                    (cur_viol - next_viol)
                    >= MIN_DECREASE * (cur_viol - inf_viol),
                )
                count = s["count"] + 1
                return dict(
                    penalty=pen,
                    result=res,
                    count=count,
                    done=ok | (count >= MAX_INCREASES),
                )

            out = lax.while_loop(
                cond,
                body,
                dict(
                    penalty=penalty,
                    result=current,
                    count=jnp.asarray(0, jnp.int32),
                    done=jnp.asarray(False),
                ),
            )
            return out["penalty"], out["result"], jnp.asarray(True)

        return lax.cond(stuck, no_change, increase_loop, None)

    # skip entirely when already (linearly) feasible enough (penalty.c:30-37)
    return lax.cond(cur_viol <= VIOLATION_TOL, no_change, do_update, None)


# Global penalty reset constants (trial_point/cauchy_step.c:15-17)
ALLOWED_DUAL_FACTOR = 1000.0
ALLOWED_DUAL_OFFSET = 1.0
PENALTY_OFFSET = 10.0


def global_penalty_reset(
    it: Iterate, penalty: Array, allow_reset: Array
) -> tuple[Array, Array]:
    """Reset an inflated penalty once feasible for several steps
    (trial_point/cauchy_step.c:55-79).  Returns (penalty, did_reset)."""
    dual_norm = jnp.maximum(
        jnp.max(jnp.abs(it.cons_dual), initial=0.0),
        jnp.max(jnp.abs(it.vars_dual), initial=0.0),
    )
    max_allowed = ALLOWED_DUAL_FACTOR * (dual_norm + ALLOWED_DUAL_OFFSET)
    reset = allow_reset & (penalty > max_allowed)
    new_penalty = jnp.where(reset, dual_norm + PENALTY_OFFSET, penalty)
    return new_penalty, reset
