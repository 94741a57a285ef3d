"""scipy-style `minimize` front end.

TPU-native equivalent of the reference Python binding
(bindings/python/src/sleqp/minimize.py): a drop-in replacement for
:func:`scipy.optimize.minimize` returning a scipy ``OptimizeResult``.

Two function paths:

* **JAX-traceable** callables (detected via ``jax.eval_shape``): wrapped
  directly; derivatives come from AD unless explicitly provided.
* **Host (numpy) callables**: wrapped with ``jax.pure_callback`` so the
  jitted solver can still drive them; derivatives use user-provided
  ``jac``/constraint jacobians or forward finite differences (the
  reference's findiff fallback, bindings/python/src/sleqp/_derivative.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .problem import Func, Problem
from .settings import Settings
from .solver import Solver, SolverEvent
from .types import HessEval, Status

try:  # scipy is available in the environment; degrade gracefully anyway
    from scipy.optimize import (
        Bounds as ScipyBounds,
        LinearConstraint,
        NonlinearConstraint,
        OptimizeResult,
    )
except ImportError:  # pragma: no cover
    ScipyBounds = LinearConstraint = NonlinearConstraint = None

    class OptimizeResult(dict):
        def __getattr__(self, name):
            return self[name]


_STATUS_MESSAGES = {
    Status.OPTIMAL: "Optimal solution found",
    Status.INFEASIBLE: "Problem is locally infeasible",
    Status.UNBOUNDED: "Problem appears unbounded",
    Status.ABORT_ITER: "Iteration limit reached",
    Status.ABORT_TIME: "Time limit reached",
    Status.ABORT_MANUAL: "Aborted by callback",
    Status.ABORT_DEADPOINT: "Stalled at a dead point",
    Status.UNKNOWN: "Unknown",
    Status.RUNNING: "Running",
}


def _is_traceable(fn: Callable, x0: np.ndarray, args: tuple) -> bool:
    try:
        jax.eval_shape(lambda x: fn(x, *args), jnp.asarray(x0))
        return True
    except Exception:
        return False


def _host_scalar(fn: Callable, args: tuple, n: int):
    """Wrap a host scalar function for use inside jit via pure_callback."""

    def wrapped(x):
        def call(xv):
            return np.asarray(fn(np.asarray(xv), *args), dtype=np.float64)

        return jax.pure_callback(
            call, jax.ShapeDtypeStruct((), jnp.float64), x, vmap_method="sequential"
        )

    return wrapped


def _host_vector(fn: Callable, args: tuple, out_dim: tuple):
    def wrapped(x):
        def call(xv):
            return np.reshape(
                np.asarray(fn(np.asarray(xv), *args), dtype=np.float64), out_dim
            )

        return jax.pure_callback(
            call,
            jax.ShapeDtypeStruct(out_dim, jnp.float64),
            x,
            vmap_method="sequential",
        )

    return wrapped


def _findiff_grad(fn: Callable, args: tuple, n: int, h: float):
    """Forward-difference gradient on the host (reference _derivative.py)."""

    def grad(xv, *_):
        xv = np.asarray(xv, dtype=np.float64)
        f0 = float(fn(xv, *args))
        out = np.zeros(n)
        for i in range(n):
            xp = xv.copy()
            xp[i] += h
            out[i] = (float(fn(xp, *args)) - f0) / h
        return out

    return grad


def _findiff_jac(fn: Callable, args: tuple, n: int, m: int, h: float):
    def jac(xv, *_):
        xv = np.asarray(xv, dtype=np.float64)
        f0 = np.asarray(fn(xv, *args), dtype=np.float64).reshape(m)
        out = np.zeros((m, n))
        for i in range(n):
            xp = xv.copy()
            xp[i] += h
            out[:, i] = (
                np.asarray(fn(xp, *args), dtype=np.float64).reshape(m) - f0
            ) / h
        return out

    return jac


def _parse_bounds(bounds, n: int):
    if bounds is None:
        return None, None
    if ScipyBounds is not None and isinstance(bounds, ScipyBounds):
        return np.broadcast_to(bounds.lb, (n,)), np.broadcast_to(bounds.ub, (n,))
    lb = np.full(n, -np.inf)
    ub = np.full(n, np.inf)
    for i, pair in enumerate(bounds):
        lo, hi = pair
        lb[i] = -np.inf if lo is None else lo
        ub[i] = np.inf if hi is None else hi
    return lb, ub


@dataclasses.dataclass
class _ConsBlock:
    fun: Callable
    jac: Optional[Callable]
    lb: np.ndarray
    ub: np.ndarray
    dim: int


def _probe_dim(fn: Callable, x0: np.ndarray, args: tuple) -> int:
    out = np.atleast_1d(np.asarray(fn(np.asarray(x0), *args)))
    return int(out.shape[0])


def _parse_constraints(constraints, x0, args) -> tuple[list[_ConsBlock], list]:
    """Split into general (nonlinear) blocks and linear blocks."""
    if constraints is None:
        return [], []
    if isinstance(constraints, dict) or (
        NonlinearConstraint is not None
        and isinstance(constraints, (NonlinearConstraint, LinearConstraint))
    ):
        constraints = [constraints]
    general: list[_ConsBlock] = []
    linear = []
    for con in constraints:
        if LinearConstraint is not None and isinstance(con, LinearConstraint):
            A = np.atleast_2d(np.asarray(con.A, dtype=np.float64))
            mrows = A.shape[0]
            linear.append(
                (
                    A,
                    np.broadcast_to(np.asarray(con.lb, dtype=np.float64), (mrows,)),
                    np.broadcast_to(np.asarray(con.ub, dtype=np.float64), (mrows,)),
                )
            )
            continue
        if NonlinearConstraint is not None and isinstance(
            con, NonlinearConstraint
        ):
            dim = _probe_dim(con.fun, x0, ())
            jac = con.jac if callable(con.jac) else None
            general.append(
                _ConsBlock(
                    fun=lambda x, *a, f=con.fun: f(x),
                    jac=(lambda x, *a, j=jac: j(x)) if jac else None,
                    lb=np.broadcast_to(np.asarray(con.lb, dtype=np.float64), (dim,)),
                    ub=np.broadcast_to(np.asarray(con.ub, dtype=np.float64), (dim,)),
                    dim=dim,
                )
            )
            continue
        if isinstance(con, dict):
            kind = con["type"]
            fn = con["fun"]
            jac = con.get("jac")
            cargs = tuple(con.get("args", ()))
            dim = _probe_dim(fn, x0, cargs)
            if kind == "eq":
                lb = np.zeros(dim)
                ub = np.zeros(dim)
            elif kind == "ineq":  # scipy convention: fun(x) >= 0
                lb = np.zeros(dim)
                ub = np.full(dim, np.inf)
            else:
                raise ValueError(f"unknown constraint type {kind!r}")
            general.append(
                _ConsBlock(
                    fun=lambda x, *a, f=fn, ca=cargs: f(x, *ca),
                    jac=(lambda x, *a, j=jac, ca=cargs: j(x, *ca))
                    if callable(jac)
                    else None,
                    lb=lb,
                    ub=ub,
                    dim=dim,
                )
            )
            continue
        raise ValueError(f"unsupported constraint spec: {con!r}")
    return general, linear


def minimize(
    fun: Callable,
    x0,
    args: tuple = (),
    jac: Optional[Callable] = None,
    hess: Optional[Callable] = None,
    hessp: Optional[Callable] = None,
    bounds=None,
    constraints=None,
    callback: Optional[Callable] = None,
    **options: Any,
) -> OptimizeResult:
    """Drop-in for scipy.optimize.minimize (reference minimize.py:165-…)."""
    if not isinstance(args, tuple):
        args = (args,)
    x0 = np.atleast_1d(np.asarray(x0, dtype=np.float64))
    n = x0.shape[0]

    max_iterations = options.pop("max_iterations", options.pop("maxiter", 1000))
    time_limit = options.pop("time_limit", None)
    options.pop("verbose", False)

    settings = Settings()
    if options:
        valid = {f.name for f in dataclasses.fields(Settings)}
        unknown = set(options) - valid
        if unknown:
            raise ValueError(f"unknown options: {sorted(unknown)}")
        settings = settings.replace(**options)

    general, linear = _parse_constraints(constraints, x0, args)

    traceable = _is_traceable(fun, x0, args) and all(
        _is_traceable(b.fun, x0, ()) for b in general
    )

    h = settings.deriv_perturbation
    num_general = sum(b.dim for b in general)

    if traceable:
        obj = lambda x: fun(x, *args)
        obj_grad = (lambda x: jac(x, *args)) if callable(jac) else None
        if general:
            blocks = list(general)

            def cons(x):
                return jnp.concatenate(
                    [jnp.reshape(jnp.asarray(b.fun(x)), (b.dim,)) for b in blocks]
                )

            cons_jac_fns = [b.jac for b in blocks]
            if all(j is not None for j in cons_jac_fns):

                def cons_jac(x):
                    return jnp.concatenate(
                        [
                            jnp.reshape(jnp.asarray(j(x)), (b.dim, n))
                            for j, b in zip(cons_jac_fns, blocks)
                        ]
                    )

            else:
                cons_jac = None
        else:
            cons = None
            cons_jac = None
        hess_prod = None
        if callable(hessp):
            hess_prod = lambda x, d, mu: hessp(x, d, *args)
        elif callable(hess):
            hess_prod = lambda x, d, mu: jnp.asarray(hess(x, *args)) @ d
    else:
        # host path: pure_callback wrappers + findiff fallbacks
        obj = _host_scalar(fun, args, n)
        grad_fn = jac if callable(jac) else _findiff_grad(fun, args, n, h)
        obj_grad = _host_vector(grad_fn, (), (n,))
        if general:
            blocks = list(general)

            def host_cons(xv):
                return np.concatenate(
                    [
                        np.reshape(np.asarray(b.fun(xv), dtype=np.float64), (b.dim,))
                        for b in blocks
                    ]
                )

            cons = _host_vector(host_cons, (), (num_general,))

            def host_jac(xv):
                rows = []
                for b in blocks:
                    if b.jac is not None:
                        rows.append(
                            np.reshape(
                                np.asarray(b.jac(xv), dtype=np.float64),
                                (b.dim, n),
                            )
                        )
                    else:
                        rows.append(_findiff_jac(b.fun, (), n, b.dim, h)(xv))
                return np.concatenate(rows, axis=0)

            cons_jac = _host_vector(host_jac, (), (num_general, n))
        else:
            cons = None
            cons_jac = None
        hess_prod = None
        if callable(hessp):
            hess_prod = lambda x, d, mu: _host_vector(
                lambda xv: hessp(np.asarray(xv[:n]), np.asarray(xv[n:]), *args),
                (),
                (n,),
            )(jnp.concatenate([x, d]))
        # no exact hessians on the host path otherwise -> quasi-Newton
        if hess_prod is None and settings.hess_eval == HessEval.EXACT:
            settings = settings.replace(hess_eval=HessEval.DAMPED_BFGS)

    # reference behavior: no hessian info -> damped BFGS (minimize.py:219-220)
    if (
        traceable
        and hess is None
        and hessp is None
        and options.get("hess_eval") is None
        and not hasattr(fun, "hessian_exact")
    ):
        # AD gives exact Hessians for traceable functions; keep EXACT.
        pass

    var_lb, var_ub = _parse_bounds(bounds, n)

    general_lb = np.concatenate([b.lb for b in general]) if general else None
    general_ub = np.concatenate([b.ub for b in general]) if general else None

    lin_A = np.concatenate([A for A, _, _ in linear]) if linear else None
    lin_lb = np.concatenate([lb for _, lb, _ in linear]) if linear else None
    lin_ub = np.concatenate([ub for _, _, ub in linear]) if linear else None

    func = Func(
        obj,
        num_variables=n,
        cons=cons,
        num_cons=num_general,
        obj_grad=obj_grad,
        cons_jac=cons_jac,
        hess_prod=hess_prod,
    )
    problem = Problem(
        func,
        var_lb=var_lb,
        var_ub=var_ub,
        general_lb=general_lb,
        general_ub=general_ub,
        linear_coeffs=lin_A,
        linear_lb=lin_lb,
        linear_ub=lin_ub,
    )

    solver = Solver(problem, x0, settings)
    if callback is not None:

        def on_accept(s):
            if callback(s.solution) is True:
                s.abort()

        solver.add_callback(SolverEvent.ACCEPTED_ITERATE, on_accept)

    status = solver.solve(max_iterations=max_iterations, time_limit=time_limit)

    result = OptimizeResult()
    result["x"] = solver.solution
    result["fun"] = solver.obj_val
    result["jac"] = np.asarray(solver.iterate.obj_grad)
    result["mult_g"] = solver.cons_dual
    result["mult_x"] = solver.vars_dual
    result["success"] = status == Status.OPTIMAL
    result["status"] = int(status)
    result["message"] = _STATUS_MESSAGES.get(status, status.name)
    result["nit"] = solver.iterations
    result["maxcv"] = solver.residuals()[0]
    return result
