"""Problem and function model.

TPU-native equivalent of the reference's L2 layer
(src/main/func.c, src/main/problem.c):

* ``Func`` wraps user callables ``obj(x)`` and ``cons(x)``.  Unlike the
  reference — where users must hand-code ``obj_grad``/``cons_jac``/``hess_prod``
  callbacks (pub_func.h:40-87) — derivatives are derived via JAX AD by
  default (grad/jacfwd/jvp), with optional user overrides mirroring the
  reference callback API.

* ``Problem`` combines a ``Func`` with variable bounds, general (nonlinear)
  constraint bounds, and separately-stored linear constraints that are
  concatenated after the general ones (reference: problem.c:28-49,199-213).

Everything evaluates to fixed-shape dense jnp arrays: the reference's sparse
``SleqpVec``/``SleqpMat`` (src/main/sparse/) are replaced by dense arrays so
that all downstream kernels map onto the MXU; structured sparsity is
reintroduced at the KKT level for large problems.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


Array = jax.Array


def _as_1d(x: Any, dim: int, dtype: Any, name: str, fill: float) -> jnp.ndarray:
    if x is None:
        return jnp.full((dim,), fill, dtype=dtype)
    arr = jnp.asarray(x, dtype=dtype)
    if arr.ndim == 0:
        arr = jnp.full((dim,), arr, dtype=dtype)
    if arr.shape != (dim,):
        raise ValueError(f"{name}: expected shape ({dim},), got {arr.shape}")
    return arr


class Func:
    """NLP function model: objective + general constraints with AD defaults.

    Parameters mirror the reference ``SleqpFunc`` callbacks (pub_func.h:40-87)
    but every derivative may be omitted:

    * ``obj``:   x -> scalar objective
    * ``cons``:  x -> (num_cons,) general constraint values (or None)
    * ``obj_grad``:  optional override, x -> (n,)
    * ``cons_jac``:  optional override, x -> (num_cons, n) dense Jacobian
    * ``hess_prod``: optional override, (x, direction, cons_dual) -> (n,)
      product of the Hessian of the Lagrangian f + mu.c with ``direction``
      (reference hess_prod semantics, pub_func.h:75-87).
    * ``psd_hessian``: declares the Hessian positive semidefinite
      (reference flag SLEQP_FUNC_HESS_PSD, func.h:18) — selects the CG TR
      solver automatically (newton.c:96-106).
    * ``accept_point``: optional x -> bool predicate; returning False
      rejects the trial point (the step is discarded and the trust radius
      shrinks).  TPU-native analogue of the reference ``set_value``
      reject flag (pub_func.h:40-44, handled in
      problem_solver/iteration.c:15-43): under jit the user cannot raise,
      so rejection is a traced predicate.  Non-finite objective or
      constraint values at a trial point are rejected unconditionally.
    """

    def __init__(
        self,
        obj: Callable[[Array], Array],
        num_variables: int,
        cons: Optional[Callable[[Array], Array]] = None,
        num_cons: int = 0,
        obj_grad: Optional[Callable[[Array], Array]] = None,
        cons_jac: Optional[Callable[[Array], Array]] = None,
        hess_prod: Optional[Callable[[Array, Array, Array], Array]] = None,
        psd_hessian: bool = False,
        hess_struct: Optional[tuple] = None,
        accept_point: Optional[Callable[[Array], Array]] = None,
    ):
        """``hess_struct``: optional tuple of (start, end) index ranges
        declaring a block-diagonal Lagrangian Hessian (reference
        SleqpHessStruct, pub_hess_struct.h:8-40).  Variables outside every
        block form the *linear range* (zero Hessian rows).  Consumed by
        the block-wise quasi-Newton approximations; AD Hessian products
        are exact regardless.
        """
        self.num_variables = int(num_variables)
        self.num_cons = int(num_cons)
        if hess_struct is not None:
            blocks = tuple((int(s), int(e)) for s, e in hess_struct)
            prev = 0
            for s, e in blocks:
                if not (prev <= s < e <= num_variables):
                    raise ValueError(
                        f"invalid hess_struct block ({s}, {e}); blocks must "
                        "be sorted, disjoint, and within the variable range"
                    )
                prev = e
            self.hess_struct = blocks
        else:
            self.hess_struct = None
        self._obj = obj
        self._cons = cons
        if cons is None and num_cons > 0:
            raise ValueError("num_cons > 0 requires a cons callable")
        self._obj_grad = obj_grad if obj_grad is not None else jax.grad(obj)
        if cons_jac is not None:
            self._cons_jac = cons_jac
        elif cons is not None:
            # mode choice: m reverse passes vs n forward passes
            self._cons_jac = (
                jax.jacrev(cons) if num_cons < num_variables else jax.jacfwd(cons)
            )
        else:
            self._cons_jac = None
        self._hess_prod = hess_prod
        self._accept_point = accept_point
        self.psd_hessian = bool(psd_hessian)

    def point_valid(self, x: Array) -> Array:
        """Traced user acceptance predicate (reference set_value reject,
        pub_func.h:40-44).  True when no predicate is installed."""
        if self._accept_point is None:
            return jnp.asarray(True)
        return jnp.reshape(jnp.asarray(self._accept_point(x)), ())

    def obj_val(self, x: Array) -> Array:
        return jnp.asarray(self._obj(x))

    def obj_grad(self, x: Array) -> Array:
        return jnp.asarray(self._obj_grad(x))

    def cons_val(self, x: Array) -> Array:
        if self._cons is None:
            return jnp.zeros((0,), dtype=x.dtype)
        return jnp.reshape(jnp.asarray(self._cons(x)), (self.num_cons,))

    def cons_jac(self, x: Array) -> Array:
        if self._cons_jac is None:
            return jnp.zeros((0, self.num_variables), dtype=x.dtype)
        return jnp.reshape(
            jnp.asarray(self._cons_jac(x)), (self.num_cons, self.num_variables)
        )

    def hess_prod(self, x: Array, direction: Array, cons_dual: Array) -> Array:
        """Hessian-of-Lagrangian product: (∇²f + Σ μ_i ∇²c_i) @ direction.

        Default: forward-over-reverse JVP of the Lagrangian gradient — one
        extra linearization, fully fusable by XLA (no materialized Hessian).
        """
        if self._hess_prod is not None:
            return jnp.asarray(self._hess_prod(x, direction, cons_dual))

        def lag_grad(z: Array) -> Array:
            g = self._obj_grad(z)
            if self._cons is not None and self.num_cons > 0:
                _, vjp = jax.vjp(self._cons, z)
                g = g + vjp(cons_dual)[0]
            return g

        return jax.jvp(lag_grad, (x,), (direction,))[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProblemData:
    """Jit-traversable numeric part of a Problem (bounds + linear rows)."""

    var_lb: Array
    var_ub: Array
    cons_lb: Array  # combined: general then linear (problem.c:199-213)
    cons_ub: Array
    linear_coeffs: Array  # (num_linear, n); empty if no linear constraints


class Problem:
    """NLP problem: min f(x) s.t. cons_lb <= c(x) <= cons_ub, var_lb <= x <= var_ub.

    General (nonlinear) constraints come from ``func``; linear constraints are
    stored explicitly and appended after them, mirroring the reference
    ``sleqp_problem_create`` (problem.c:274-301).
    """

    def __init__(
        self,
        func: Func,
        var_lb: Any = None,
        var_ub: Any = None,
        general_lb: Any = None,
        general_ub: Any = None,
        linear_coeffs: Any = None,
        linear_lb: Any = None,
        linear_ub: Any = None,
        dtype: Any = jnp.float64,
    ):
        self.func = func
        self.dtype = dtype
        n = func.num_variables
        mg = func.num_cons
        self.num_variables = n
        self.num_general = mg

        var_lb = _as_1d(var_lb, n, dtype, "var_lb", -jnp.inf)
        var_ub = _as_1d(var_ub, n, dtype, "var_ub", jnp.inf)
        general_lb = _as_1d(general_lb, mg, dtype, "general_lb", -jnp.inf)
        general_ub = _as_1d(general_ub, mg, dtype, "general_ub", jnp.inf)

        if linear_coeffs is not None:
            lin = jnp.asarray(linear_coeffs, dtype=dtype)
            if lin.ndim != 2 or lin.shape[1] != n:
                raise ValueError(f"linear_coeffs must be (num_linear, {n})")
            ml = lin.shape[0]
        else:
            lin = jnp.zeros((0, n), dtype=dtype)
            ml = 0
        self.num_linear = ml
        linear_lb = _as_1d(linear_lb, ml, dtype, "linear_lb", -jnp.inf)
        linear_ub = _as_1d(linear_ub, ml, dtype, "linear_ub", jnp.inf)

        self.num_cons = mg + ml
        self.data = ProblemData(
            var_lb=var_lb,
            var_ub=var_ub,
            cons_lb=jnp.concatenate([general_lb, linear_lb]),
            cons_ub=jnp.concatenate([general_ub, linear_ub]),
            linear_coeffs=lin,
        )

    # -- combined evaluations (reference: problem.c sleqp_problem_eval) -----

    def obj_val(self, x: Array) -> Array:
        return self.func.obj_val(x)

    def obj_grad(self, x: Array) -> Array:
        return self.func.obj_grad(x)

    def cons_val(self, x: Array) -> Array:
        """General constraint values with linear rows appended."""
        parts = []
        if self.num_general:
            parts.append(self.func.cons_val(x))
        if self.num_linear:
            parts.append(self.data.linear_coeffs @ x)
        if not parts:
            return jnp.zeros((0,), dtype=x.dtype)
        return jnp.concatenate(parts)

    def cons_jac(self, x: Array) -> Array:
        parts = []
        if self.num_general:
            parts.append(self.func.cons_jac(x))
        if self.num_linear:
            parts.append(self.data.linear_coeffs)
        if not parts:
            return jnp.zeros((0, self.num_variables), dtype=x.dtype)
        return jnp.concatenate(parts, axis=0)

    def hess_prod(self, x: Array, direction: Array, cons_dual: Array) -> Array:
        """Lagrangian Hessian product; linear rows contribute nothing."""
        general_dual = cons_dual[: self.num_general]
        return self.func.hess_prod(x, direction, general_dual)

    def eval_all(self, x: Array):
        """One-shot (f, grad, c, J) evaluation (reference: util.c:13)."""
        return (
            self.obj_val(x),
            self.obj_grad(x),
            self.cons_val(x),
            self.cons_jac(x),
        )

    def clip_to_bounds(self, x: Array) -> Array:
        """Clip a point into the variable box (reference: solver/solve.c:57-93)."""
        return jnp.clip(x, self.data.var_lb, self.data.var_ub)

    def astype(self, dtype: Any) -> "Problem":
        """Rebuild this problem with bounds/linear data in ``dtype``.

        The user callables in ``func`` are dtype-agnostic (they follow
        their input dtype; float64 constants closed over by them are
        demoted at trace time under ``types.f32_compute_scope``).  Used
        by the two-phase mixed-precision batched solver
        (parallel/batch.py::batched_solve_mp)."""
        d = self.data
        return Problem(
            self.func,
            var_lb=d.var_lb.astype(dtype),
            var_ub=d.var_ub.astype(dtype),
            general_lb=d.cons_lb[: self.num_general].astype(dtype),
            general_ub=d.cons_ub[: self.num_general].astype(dtype),
            linear_coeffs=(
                d.linear_coeffs.astype(dtype) if self.num_linear else None
            ),
            linear_lb=(
                d.cons_lb[self.num_general :].astype(dtype)
                if self.num_linear
                else None
            ),
            linear_ub=(
                d.cons_ub[self.num_general :].astype(dtype)
                if self.num_linear
                else None
            ),
            dtype=dtype,
        )


class LSQFunc(Func):
    """Least-squares function model (reference: src/main/lsq.c).

    Wraps residual callbacks into a Func whose objective is ``0.5*||r(x)||^2``
    and whose Hessian product is the Gauss-Newton approximation
    ``J_r^T J_r d (+ lm_factor * d)`` (lsq.c:21,238-244).  The constraint part
    behaves exactly like a regular Func.
    """

    def __init__(
        self,
        residuals: Callable[[Array], Array],
        num_variables: int,
        num_residuals: int,
        cons: Optional[Callable[[Array], Array]] = None,
        num_cons: int = 0,
        lm_factor: float = 0.0,
    ):
        self.residuals = residuals
        self.num_residuals = int(num_residuals)
        self.lm_factor = float(lm_factor)

        def obj(x: Array) -> Array:
            r = residuals(x)
            return 0.5 * jnp.vdot(r, r)

        def hess_prod(x: Array, direction: Array, cons_dual: Array) -> Array:
            # Gauss-Newton: J_r^T (J_r d); constraint curvature ignored
            # (matches the reference's Gauss-Newton model, lsq.c:238-244).
            _, jvp_out = jax.jvp(residuals, (x,), (direction,))
            _, vjp = jax.vjp(residuals, x)
            out = vjp(jvp_out)[0]
            if self.lm_factor != 0.0:
                out = out + self.lm_factor * direction
            return out

        super().__init__(
            obj=obj,
            num_variables=num_variables,
            cons=cons,
            num_cons=num_cons,
            hess_prod=hess_prod,
            psd_hessian=True,
        )
