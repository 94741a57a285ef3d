"""Medium-scale (n ~ 100-1000) benchmark problems with known optima.

The reference sweeps the CUTEst MASTSIF set, which spans tiny HS
problems up to n ~ 10^4-10^5 (src/test/cutest/CMakeLists.txt:1-30).
The HS transcription (hs.py) covers the tiny end; this module adds
scalable classics from the same literature (Moré-Garbow-Hillstrom 1981
test set and standard CUTEst families) with *analytic* optima, so the
suite exercises the dense general path well beyond n = 10.

Each entry returns (Problem, x0, f_opt), same contract as hs.py.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..problem import Func, LSQFunc, Problem

_REGISTRY: dict[str, Callable] = {}


def _register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_problem(name: str):
    return _REGISTRY[name]()


@_register("extrosnb100")
def extrosnb100():
    """Extended Rosenbrock, n=100 (MGH21 / CUTEst SROSENBR): f* = 0."""
    n = 100

    def obj(x):
        return jnp.sum(
            100.0 * (x[1::2] - x[0::2] ** 2) ** 2 + (1.0 - x[0::2]) ** 2
        )

    func = Func(obj, num_variables=n)
    x0 = jnp.tile(jnp.array([-1.2, 1.0]), n // 2)
    return Problem(func), x0, 0.0


@_register("powellsg100")
def powellsg100():
    """Extended Powell singular, n=100 (MGH13 / CUTEst POWELLSG): f* = 0."""
    n = 100

    def obj(x):
        a, b, c, d = x[0::4], x[1::4], x[2::4], x[3::4]
        return jnp.sum(
            (a + 10.0 * b) ** 2
            + 5.0 * (c - d) ** 2
            + (b - 2.0 * c) ** 4
            + 10.0 * (a - d) ** 4
        )

    func = Func(obj, num_variables=n)
    x0 = jnp.tile(jnp.array([3.0, -1.0, 0.0, 1.0]), n // 4)
    return Problem(func), x0, 0.0


@_register("dqrtic100")
def dqrtic100():
    """DQRTIC, n=100: min sum (x_i - i)^4, f* = 0."""
    n = 100
    tgt = jnp.arange(1.0, n + 1.0)

    def obj(x):
        return jnp.sum((x - tgt) ** 4)

    func = Func(obj, num_variables=n)
    return Problem(func), jnp.full((n,), 2.0), 0.0


@_register("broydn100")
def broydn100():
    """Broyden tridiagonal system as LSQ, n=100 (MGH30 / CUTEst
    BROYDN3DLS): the system has a root, so f* = 0."""
    n = 100

    def residuals(x):
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1)])
        return (3.0 - 2.0 * x) * x - xm - 2.0 * xp + 1.0

    func = LSQFunc(residuals, num_variables=n, num_residuals=n)
    return Problem(func), jnp.full((n,), -1.0), 0.0


@_register("normsum500")
def normsum500():
    """Quadratic over the simplex-like plane, n=500:
    min ||x||^2 s.t. sum x = 1, x >= 0 -> x* = 1/n, f* = 1/n."""
    n = 500

    def obj(x):
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=n, psd_hessian=True)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=jnp.inf,
        linear_coeffs=jnp.ones((1, n)),
        linear_lb=jnp.array([1.0]),
        linear_ub=jnp.array([1.0]),
    )
    return problem, jnp.full((n,), 2.0 / n), 1.0 / n


@_register("boxqp1000")
def boxqp1000():
    """Separable box QP, n=1000: min sum (x_i - c_i)^2, 0 <= x <= 1;
    f* = sum dist(c_i, [0,1])^2 (closed form)."""
    n = 1000
    rng = np.random.default_rng(7)
    c = rng.uniform(-0.5, 1.5, n)
    f_opt = float(np.sum(np.clip(c - 1.0, 0.0, None) ** 2 + np.clip(-c, 0.0, None) ** 2))
    cj = jnp.asarray(c)

    def obj(x):
        return jnp.sum((x - cj) ** 2)

    func = Func(obj, num_variables=n, psd_hessian=True)
    problem = Problem(func, var_lb=0.0, var_ub=1.0)
    return problem, jnp.full((n,), 0.5), f_opt


@_register("chainqp200")
def chainqp200():
    """Chained inequality QP, n=200: min sum (x_i - t_i)^2 s.t.
    |x_{i+1} - x_i| <= 0.005 with t_i = i/(n-1); the chain constraint
    is inactive at x = t (slope exactly 1/(n-1) < 0.006), so f* = 0."""
    n = 200
    t = jnp.linspace(0.0, 1.0, n)

    def obj(x):
        return jnp.sum((x - t) ** 2)

    A = np.zeros((n - 1, n))
    for i in range(n - 1):
        A[i, i] = -1.0
        A[i, i + 1] = 1.0

    func = Func(obj, num_variables=n, psd_hessian=True)
    problem = Problem(
        func,
        linear_coeffs=jnp.asarray(A),
        linear_lb=-0.006,
        linear_ub=0.006,
    )
    return problem, jnp.zeros((n,)), 0.0


MEDIUM_PROBLEMS = sorted(_REGISTRY.keys())
