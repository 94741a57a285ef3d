"""Power-of-two problem scaling.

TPU-native equivalent of src/main/scale.c + problem_scaling.c: the scaled
NLP (pub_scale.h:14-60)

    f'(x') = 2^{-lam} f(x),   c' = 2^{-alpha} . c,   x' = 2^{-beta} . x

with integer weights (lam, alpha, beta); all factors are powers of two so
scaling/unscaling is *exact* on floats (apart from over/underflow) — the
reference applies them with ldexp (scale.c:35-69), mirrored here with
jnp.ldexp.  Function evaluations happen in original space; scaling is
applied outside (problem_scaling.c).

Derivative transforms:
    grad' = 2^{beta - lam} . grad
    J'_{ij} = 2^{-alpha_i + beta_j} J_{ij}
    cons duals: mu = 2^{lam - alpha} . mu'   (unscale)
    var  duals: nu = 2^{lam - beta}  . nu'
    Hessian product: H' d = 2^{beta - lam} . H(2^{beta} . d) with the
    constraint multipliers unscaled first.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .problem import Func, Problem

Array = jax.Array


def _frexp_weight(value: float) -> int:
    """Exponent e with value = m * 2^e, 0.5 <= |m| < 1 (scale.c:165)."""
    if value == 0 or not math.isfinite(value):
        return 0
    return math.frexp(value)[1]


@dataclasses.dataclass
class Scaling:
    """Integer scaling weights (reference SleqpScaling)."""

    num_variables: int
    num_cons: int
    obj_weight: int = 0
    var_weights: Optional[np.ndarray] = None
    cons_weights: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.var_weights is None:
            self.var_weights = np.zeros(self.num_variables, dtype=np.int32)
        if self.cons_weights is None:
            self.cons_weights = np.zeros(self.num_cons, dtype=np.int32)

    # -- nominal-value APIs (pub_scale.h, scale.c:160-250) --------------

    def set_obj_weight_from_nominal(self, nominal: float) -> None:
        self.obj_weight = _frexp_weight(nominal)

    def set_var_weights_from_nominal(self, nominal) -> None:
        self.var_weights = np.array(
            [_frexp_weight(v) for v in np.asarray(nominal)], dtype=np.int32
        )

    def set_cons_weights_from_nominal(self, nominal) -> None:
        self.cons_weights = np.array(
            [_frexp_weight(v) for v in np.asarray(nominal)], dtype=np.int32
        )

    # -- derived from derivatives (scale.c:640-740) ---------------------

    def derive_obj_weight_from_grad(self, grad) -> None:
        """Weight making max |grad'| ~ 1 (scale.c:657 frexp(1/max))."""
        max_val = float(np.max(np.abs(np.asarray(grad)), initial=0.0))
        self.obj_weight = -_frexp_weight(1.0 / max_val) if max_val > 0 else 0

    def derive_cons_weights_from_jac(self, cons_jac) -> None:
        J = np.asarray(cons_jac)
        for i in range(J.shape[0]):
            max_val = float(np.max(np.abs(J[i]), initial=0.0))
            self.cons_weights[i] = (
                -_frexp_weight(1.0 / max_val) if max_val > 0 else 0
            )


def _ldexp(x: Array, weights) -> Array:
    return jnp.ldexp(x, jnp.asarray(weights))


def derive_scaling(problem: Problem, x) -> Scaling:
    """Scaling weights derived from first derivatives at ``x`` so that
    max |grad'| ~ 1 and max |J'_i| ~ 1 per row (scale.c:640-740,
    sleqp_scaling_from_gradient / sleqp_scaling_from_cons_jac)."""
    x = problem.clip_to_bounds(jnp.asarray(x, problem.dtype))
    scaling = Scaling(problem.num_variables, problem.num_cons)
    scaling.derive_obj_weight_from_grad(np.asarray(problem.obj_grad(x)))
    if problem.num_cons:
        scaling.derive_cons_weights_from_jac(
            np.asarray(problem.cons_jac(x))
        )
    return scaling


class ScaledProblem(Problem):
    """A Problem evaluating the scaled NLP over the original func."""

    def __init__(self, problem: Problem, scaling: Scaling):
        if (
            scaling.num_variables != problem.num_variables
            or scaling.num_cons != problem.num_cons
        ):
            raise ValueError("scaling dimensions do not match problem")
        self.original = problem
        self.scaling = scaling

        lam = int(scaling.obj_weight)
        beta = np.asarray(scaling.var_weights, dtype=np.int32)
        alpha = np.asarray(scaling.cons_weights, dtype=np.int32)

        def unscale_x(xs):
            return _ldexp(xs, beta)

        def obj(xs):
            return jnp.ldexp(problem.obj_val(unscale_x(xs)), -lam)

        mg = problem.num_general
        alpha_general = alpha[:mg]

        def cons(xs):
            # only the general part; linear rows are scaled coefficients
            x = unscale_x(xs)
            c = problem.func.cons_val(x)
            return _ldexp(c, -alpha_general)

        def obj_grad(xs):
            g = problem.obj_grad(unscale_x(xs))
            return _ldexp(g, beta - lam)

        def cons_jac(xs):
            J = problem.func.cons_jac(unscale_x(xs))
            return jnp.ldexp(J, (-alpha_general[:, None] + beta[None, :]))

        def hess_prod(xs, d, mu_scaled):
            x = unscale_x(xs)
            mu = _ldexp(mu_scaled, lam - alpha_general)
            hd = problem.func.hess_prod(x, _ldexp(d, beta), mu)
            return _ldexp(hd, beta - lam)

        from .dyn import DynFunc

        if isinstance(problem.func, DynFunc):
            # Dynamic functions stay dynamic under scaling
            # (problem_scaling.c:276-345): values are scaled on the way
            # out, and the solver's error weights are scaled on the way
            # *in* (scaled_dyn_func_set_obj_weight / _set_cons_weights:
            # ldexp(w, -exponent)) so that the inner weighted-error
            # contract |Pi - Pi_eps| <= error_bound refers to the scaled
            # merit the solver actually measures.
            inner = problem.func

            def dyn_eval(xs, error_bound, obj_weight, cons_weights):
                x = unscale_x(xs)
                w_f = jnp.ldexp(obj_weight, -lam)
                w_c = _ldexp(cons_weights, -alpha_general)
                obj_v, cons_v, err = inner.eval_fn(
                    x, error_bound, w_f, w_c
                )
                return (
                    jnp.ldexp(obj_v, -lam),
                    _ldexp(cons_v, -alpha_general),
                    err,
                )

            func = DynFunc(
                dyn_eval,
                num_variables=problem.num_variables,
                num_cons=mg,
                psd_hessian=problem.func.psd_hessian,
            )
            func.initial_error_bound = inner.initial_error_bound
        else:
            func = Func(
                obj,
                num_variables=problem.num_variables,
                cons=cons if mg else None,
                num_cons=mg,
                obj_grad=obj_grad,
                cons_jac=cons_jac if mg else None,
                hess_prod=hess_prod,
                psd_hessian=problem.func.psd_hessian,
            )

        ml = problem.num_linear
        alpha_linear = alpha[mg:]
        lin_coeffs = None
        lin_lb = lin_ub = None
        if ml:
            lin_coeffs = jnp.ldexp(
                problem.data.linear_coeffs,
                (-alpha_linear[:, None] + beta[None, :]),
            )
            lin_lb = _ldexp(problem.data.cons_lb[mg:], -alpha_linear)
            lin_ub = _ldexp(problem.data.cons_ub[mg:], -alpha_linear)

        super().__init__(
            func,
            var_lb=_ldexp(problem.data.var_lb, -beta),
            var_ub=_ldexp(problem.data.var_ub, -beta),
            general_lb=_ldexp(problem.data.cons_lb[:mg], -alpha_general),
            general_ub=_ldexp(problem.data.cons_ub[:mg], -alpha_general),
            linear_coeffs=lin_coeffs,
            linear_lb=lin_lb,
            linear_ub=lin_ub,
            dtype=problem.dtype,
        )

    # -- point / value transforms (problem_scaling.c, scale.c) ----------

    def scale_point(self, x: Array) -> Array:
        return _ldexp(jnp.asarray(x, self.dtype), -np.asarray(self.scaling.var_weights))

    def unscale_point(self, xs: Array) -> Array:
        return _ldexp(xs, np.asarray(self.scaling.var_weights))

    def unscale_obj(self, obj_scaled: Array) -> Array:
        return jnp.ldexp(obj_scaled, int(self.scaling.obj_weight))

    def unscale_cons_dual(self, mu_scaled: Array) -> Array:
        w = int(self.scaling.obj_weight) - np.asarray(self.scaling.cons_weights)
        return _ldexp(mu_scaled, w)

    def unscale_vars_dual(self, nu_scaled: Array) -> Array:
        w = int(self.scaling.obj_weight) - np.asarray(self.scaling.var_weights)
        return _ldexp(nu_scaled, w)
