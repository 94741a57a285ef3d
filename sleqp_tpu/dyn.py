"""Dynamic (inexact, adaptive-accuracy) function model.

TPU-native equivalent of src/main/dyn.c + the trial-point refinement loop
(trial_point.c:791-933): a ``DynFunc`` evaluates the objective and
constraints *inexactly* — the user callable receives the current error
bound and weights and returns values together with an error estimate:

    eval(x, error_bound, obj_weight, cons_weights)
        -> (obj, cons_vals, error_estimate)

The solver requires the weighted error ``obj_weight * err_f +
sum(cons_weights * err_c)`` to stay below ``error_bound``; constraint
weights equal the penalty parameter (dyn.c:396-420) and the objective
weight is 1.

Refinement: the reference re-computes the trial point in an inner loop
until ``error_estimate <= 0.4 * accepted_reduction * model_reduction``
(trial_point.c:797-810).  Here the same fixed point is reached across
*outer* iterations: an insufficient-accuracy step is rejected, the error
bound tightens to the required value, and the iterate re-evaluates at the
start of the next iteration (one extra SQP iteration per refinement in
exchange for a single jitted program).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .problem import Func

Array = jax.Array

# trial_point.c:806: required accuracy = .4 * accepted_reduction * reduction
REQUIRED_ACCURACY_FACTOR = 0.4


class DynFunc(Func):
    """Inexact function model (reference sleqp_dyn_func_create, pub_dyn.h).

    ``eval`` must be JAX-traceable in x and the error bound.  Derivatives
    are taken through ``eval`` at the same accuracy via AD unless
    overridden.
    """

    def __init__(
        self,
        eval_fn: Callable,
        num_variables: int,
        num_cons: int = 0,
        psd_hessian: bool = False,
    ):
        self.eval_fn = eval_fn
        self.initial_error_bound = 1.0

        def obj(x):
            raise RuntimeError(
                "DynFunc must be evaluated through eval_dyn with an error bound"
            )

        # Build a Func whose callables close over a *mutable-free* error
        # bound via functools-style indirection: the solver always calls
        # the *_dyn variants below.
        super().__init__(
            obj=lambda x: self.obj_val_dyn(x, jnp.asarray(self.initial_error_bound))[0],
            num_variables=num_variables,
            cons=(
                (lambda x: self.eval_at(x, jnp.asarray(self.initial_error_bound))[1])
                if num_cons
                else None
            ),
            num_cons=num_cons,
            psd_hessian=psd_hessian,
        )

    # -- dynamic evaluations -------------------------------------------

    def eval_at(self, x: Array, error_bound: Array, penalty: Array = 1.0):
        obj_weight = jnp.asarray(1.0, dtype=jnp.result_type(x))
        cons_weights = jnp.full((self.num_cons,), penalty)
        out = self.eval_fn(x, error_bound, obj_weight, cons_weights)
        obj, cons, err = out
        return (
            jnp.asarray(obj),
            jnp.reshape(jnp.asarray(cons), (self.num_cons,)),
            jnp.asarray(err),
        )

    def obj_val_dyn(self, x, error_bound, penalty=1.0):
        obj, _, err = self.eval_at(x, error_bound, penalty)
        return obj, err

    def hess_prod_dyn(
        self,
        x: Array,
        direction: Array,
        cons_dual: Array,
        error_bound: Array,
        penalty: Array,
    ) -> Array:
        """Lagrangian Hessian product through the *current-accuracy* eval."""

        def lag_grad(z):
            def lag(w):
                obj, cons, _ = self.eval_at(w, error_bound, penalty)
                if self.num_cons:
                    return obj + jnp.vdot(cons_dual, cons)
                return obj

            return jax.grad(lag)(z)

        return jax.jvp(lag_grad, (x,), (direction,))[1]

    def eval_all_dyn(self, x: Array, error_bound: Array, penalty: Array):
        """(obj, grad, cons, jac, error) at the given accuracy."""
        obj, cons, err = self.eval_at(x, error_bound, penalty)

        grad = jax.grad(
            lambda z: self.eval_at(z, error_bound, penalty)[0]
        )(x)
        if self.num_cons:
            jac = jax.jacfwd(
                lambda z: self.eval_at(z, error_bound, penalty)[1]
            )(x)
        else:
            jac = jnp.zeros((0, self.num_variables), dtype=x.dtype)
        return obj, grad, cons, jac, err


def required_error_bound(
    accepted_reduction: float, model_reduction: Array
) -> Array:
    """trial_point.c:797-810 compute_required_error_bound."""
    return REQUIRED_ACCURACY_FACTOR * accepted_reduction * model_reduction
