"""Hock-Schittkowski test problems as JAX NLPs.

The reference benchmarks against CUTEst SIF decodings of (among others)
this classic collection (src/test/cutest/CMakeLists.txt).  SIF decoding
needs external tooling unavailable here, so the suite is transcribed
directly from the published problem statements (W. Hock, K. Schittkowski,
"Test Examples for Nonlinear Programming Codes", 1981).

Each entry returns (Problem, x0, f_opt) with f_opt the published optimal
objective value (None when only feasibility matters).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..problem import Func, Problem

INF = jnp.inf

_REGISTRY: dict[str, Callable] = {}


def _register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_problem(name: str):
    return _REGISTRY[name]()


def _make(
    obj,
    n,
    x0,
    cons=None,
    m=0,
    var_lb=None,
    var_ub=None,
    cons_lb=None,
    cons_ub=None,
):
    func = Func(obj, num_variables=n, cons=cons, num_cons=m)
    problem = Problem(
        func,
        var_lb=var_lb,
        var_ub=var_ub,
        general_lb=cons_lb,
        general_ub=cons_ub,
    )
    return problem, jnp.asarray(x0, dtype=jnp.float64)


# ---------------------------------------------------------------------------
# unconstrained / box-constrained
# ---------------------------------------------------------------------------


@_register("hs1")
def hs1():
    obj = lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
    p, x0 = _make(obj, 2, [-2.0, 1.0], var_lb=[-INF, -1.5])
    return p, x0, 0.0


@_register("hs3")
def hs3():
    obj = lambda x: x[1] + 1e-5 * (x[1] - x[0]) ** 2
    p, x0 = _make(obj, 2, [10.0, 1.0], var_lb=[-INF, 0.0])
    return p, x0, 0.0


@_register("hs4")
def hs4():
    obj = lambda x: (x[0] + 1.0) ** 3 / 3.0 + x[1]
    p, x0 = _make(obj, 2, [1.125, 0.125], var_lb=[1.0, 0.0])
    return p, x0, 8.0 / 3.0


@_register("hs5")
def hs5():
    obj = lambda x: (
        jnp.sin(x[0] + x[1])
        + (x[0] - x[1]) ** 2
        - 1.5 * x[0]
        + 2.5 * x[1]
        + 1.0
    )
    p, x0 = _make(
        obj, 2, [0.0, 0.0], var_lb=[-1.5, -3.0], var_ub=[4.0, 3.0]
    )
    return p, x0, -(math.sqrt(3.0) / 2.0 + math.pi / 3.0)


@_register("hs38")
def hs38():
    def obj(x):
        return (
            100.0 * (x[1] - x[0] ** 2) ** 2
            + (1.0 - x[0]) ** 2
            + 90.0 * (x[3] - x[2] ** 2) ** 2
            + (1.0 - x[2]) ** 2
            + 10.1 * ((x[1] - 1.0) ** 2 + (x[3] - 1.0) ** 2)
            + 19.8 * (x[1] - 1.0) * (x[3] - 1.0)
        )

    p, x0 = _make(
        obj, 4, [-3.0, -1.0, -3.0, -1.0], var_lb=-10.0, var_ub=10.0
    )
    return p, x0, 0.0


@_register("hs45")
def hs45():
    obj = lambda x: 2.0 - x[0] * x[1] * x[2] * x[3] * x[4] / 120.0
    p, x0 = _make(
        obj,
        5,
        [2.0] * 5,
        var_lb=0.0,
        var_ub=jnp.arange(1.0, 6.0),
    )
    return p, x0, 1.0


# ---------------------------------------------------------------------------
# equality constrained
# ---------------------------------------------------------------------------


@_register("hs6")
def hs6():
    obj = lambda x: (1.0 - x[0]) ** 2
    cons = lambda x: jnp.array([10.0 * (x[1] - x[0] ** 2)])
    p, x0 = _make(
        obj, 2, [-1.2, 1.0], cons=cons, m=1, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, 0.0


@_register("hs7")
def hs7():
    obj = lambda x: jnp.log(1.0 + x[0] ** 2) - x[1]
    cons = lambda x: jnp.array([(1.0 + x[0] ** 2) ** 2 + x[1] ** 2 - 4.0])
    p, x0 = _make(
        obj, 2, [2.0, 2.0], cons=cons, m=1, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, -math.sqrt(3.0)


@_register("hs8")
def hs8():
    obj = lambda x: -1.0 + 0.0 * x[0]
    cons = lambda x: jnp.array(
        [x[0] ** 2 + x[1] ** 2 - 25.0, x[0] * x[1] - 9.0]
    )
    p, x0 = _make(
        obj, 2, [2.0, 1.0], cons=cons, m=2, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, -1.0


@_register("hs9")
def hs9():
    obj = lambda x: jnp.sin(jnp.pi * x[0] / 12.0) * jnp.cos(
        jnp.pi * x[1] / 16.0
    )
    cons = lambda x: jnp.array([4.0 * x[0] - 3.0 * x[1]])
    p, x0 = _make(
        obj, 2, [0.0, 0.0], cons=cons, m=1, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, -0.5


@_register("hs26")
def hs26():
    obj = lambda x: (x[0] - x[1]) ** 2 + (x[1] - x[2]) ** 4
    cons = lambda x: jnp.array([(1.0 + x[1] ** 2) * x[0] + x[2] ** 4 - 3.0])
    p, x0 = _make(
        obj, 3, [-2.6, 2.0, 2.0], cons=cons, m=1, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, 0.0


@_register("hs27")
def hs27():
    obj = lambda x: 0.01 * (x[0] - 1.0) ** 2 + (x[1] - x[0] ** 2) ** 2
    cons = lambda x: jnp.array([x[0] + x[2] ** 2 + 1.0])
    p, x0 = _make(
        obj, 3, [2.0, 2.0, 2.0], cons=cons, m=1, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, 0.04


@_register("hs28")
def hs28():
    obj = lambda x: (x[0] + x[1]) ** 2 + (x[1] + x[2]) ** 2
    p, x0 = _make(
        lambda x: (x[0] + x[1]) ** 2 + (x[1] + x[2]) ** 2,
        3,
        [-4.0, 1.0, 1.0],
    )
    # linear constraint x1 + 2 x2 + 3 x3 = 1
    func = Func(obj, num_variables=3)
    problem = Problem(
        func,
        linear_coeffs=jnp.array([[1.0, 2.0, 3.0]]),
        linear_lb=1.0,
        linear_ub=1.0,
    )
    return problem, x0, 0.0


@_register("hs39")
def hs39():
    obj = lambda x: -x[0]
    cons = lambda x: jnp.array(
        [x[1] - x[0] ** 3 - x[2] ** 2, x[0] ** 2 - x[1] - x[3] ** 2]
    )
    p, x0 = _make(
        obj, 4, [2.0, 2.0, 2.0, 2.0], cons=cons, m=2, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, -1.0


@_register("hs40")
def hs40():
    obj = lambda x: -x[0] * x[1] * x[2] * x[3]
    cons = lambda x: jnp.array(
        [
            x[0] ** 3 + x[1] ** 2 - 1.0,
            x[0] ** 2 * x[3] - x[2],
            x[3] ** 2 - x[1],
        ]
    )
    p, x0 = _make(
        obj, 4, [0.8, 0.8, 0.8, 0.8], cons=cons, m=3, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, -0.25


@_register("hs42")
def hs42():
    obj = lambda x: (
        (x[0] - 1.0) ** 2
        + (x[1] - 2.0) ** 2
        + (x[2] - 3.0) ** 2
        + (x[3] - 4.0) ** 2
    )
    cons = lambda x: jnp.array([x[0] - 2.0, x[2] ** 2 + x[3] ** 2 - 2.0])
    p, x0 = _make(
        obj, 4, [1.0, 1.0, 1.0, 1.0], cons=cons, m=2, cons_lb=0.0, cons_ub=0.0
    )
    return p, x0, 28.0 - 10.0 * math.sqrt(2.0)


@_register("hs48")
def hs48():
    obj = lambda x: (x[0] - 1.0) ** 2 + (x[1] - x[2]) ** 2 + (x[3] - x[4]) ** 2
    func = Func(obj, num_variables=5)
    problem = Problem(
        func,
        linear_coeffs=jnp.array(
            [[1.0, 1.0, 1.0, 1.0, 1.0], [0.0, 0.0, 1.0, -2.0, -2.0]]
        ),
        linear_lb=jnp.array([5.0, -3.0]),
        linear_ub=jnp.array([5.0, -3.0]),
    )
    return problem, jnp.array([3.0, 5.0, -3.0, 2.0, -2.0]), 0.0


@_register("hs51")
def hs51():
    obj = lambda x: (
        (x[0] - x[1]) ** 2
        + (x[1] + x[2] - 2.0) ** 2
        + (x[3] - 1.0) ** 2
        + (x[4] - 1.0) ** 2
    )
    func = Func(obj, num_variables=5)
    problem = Problem(
        func,
        linear_coeffs=jnp.array(
            [
                [1.0, 3.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, 1.0, 1.0, -2.0],
                [0.0, 1.0, 0.0, 0.0, -1.0],
            ]
        ),
        linear_lb=jnp.array([4.0, 0.0, 0.0]),
        linear_ub=jnp.array([4.0, 0.0, 0.0]),
    )
    return problem, jnp.array([2.5, 0.5, 2.0, -1.0, 0.5]), 0.0


@_register("hs52")
def hs52():
    obj = lambda x: (
        (4.0 * x[0] - x[1]) ** 2
        + (x[1] + x[2] - 2.0) ** 2
        + (x[3] - 1.0) ** 2
        + (x[4] - 1.0) ** 2
    )
    func = Func(obj, num_variables=5)
    problem = Problem(
        func,
        linear_coeffs=jnp.array(
            [
                [1.0, 3.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, 1.0, 1.0, -2.0],
                [0.0, 1.0, 0.0, 0.0, -1.0],
            ]
        ),
        linear_lb=jnp.array([0.0, 0.0, 0.0]),
        linear_ub=jnp.array([0.0, 0.0, 0.0]),
    )
    return problem, jnp.array([2.0, 2.0, 2.0, 2.0, 2.0]), 1859.0 / 349.0


# ---------------------------------------------------------------------------
# inequality constrained
# ---------------------------------------------------------------------------


@_register("hs10")
def hs10():
    obj = lambda x: x[0] - x[1]
    cons = lambda x: jnp.array(
        [-3.0 * x[0] ** 2 + 2.0 * x[0] * x[1] - x[1] ** 2 + 1.0]
    )
    p, x0 = _make(
        obj, 2, [-10.0, 10.0], cons=cons, m=1, cons_lb=0.0, cons_ub=INF
    )
    return p, x0, -1.0


@_register("hs11")
def hs11():
    obj = lambda x: (x[0] - 5.0) ** 2 + x[1] ** 2 - 25.0
    cons = lambda x: jnp.array([-(x[0] ** 2) + x[1]])
    p, x0 = _make(
        obj, 2, [4.9, 0.1], cons=cons, m=1, cons_lb=0.0, cons_ub=INF
    )
    return p, x0, -8.498464223


@_register("hs12")
def hs12():
    obj = lambda x: (
        0.5 * x[0] ** 2 + x[1] ** 2 - x[0] * x[1] - 7.0 * x[0] - 7.0 * x[1]
    )
    cons = lambda x: jnp.array([25.0 - 4.0 * x[0] ** 2 - x[1] ** 2])
    p, x0 = _make(
        obj, 2, [0.0, 0.0], cons=cons, m=1, cons_lb=0.0, cons_ub=INF
    )
    return p, x0, -30.0


@_register("hs14")
def hs14():
    obj = lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2
    cons = lambda x: jnp.array(
        [
            x[0] - 2.0 * x[1] + 1.0,
            -0.25 * x[0] ** 2 - x[1] ** 2 + 1.0,
        ]
    )
    p, x0 = _make(
        obj,
        2,
        [2.0, 2.0],
        cons=cons,
        m=2,
        cons_lb=jnp.array([0.0, 0.0]),
        cons_ub=jnp.array([0.0, INF]),
    )
    return p, x0, 9.0 - 2.875 * math.sqrt(7.0)


@_register("hs15")
def hs15():
    obj = lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
    cons = lambda x: jnp.array([x[0] * x[1] - 1.0, x[0] + x[1] ** 2])
    p, x0 = _make(
        obj,
        2,
        [-2.0, 1.0],
        cons=cons,
        m=2,
        var_ub=[0.5, INF],
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 306.5


@_register("hs18")
def hs18():
    obj = lambda x: 0.01 * x[0] ** 2 + x[1] ** 2
    cons = lambda x: jnp.array(
        [x[0] * x[1] - 25.0, x[0] ** 2 + x[1] ** 2 - 25.0]
    )
    p, x0 = _make(
        obj,
        2,
        [2.0, 2.0],
        cons=cons,
        m=2,
        var_lb=[2.0, 0.0],
        var_ub=[50.0, 50.0],
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 5.0


@_register("hs21")
def hs21():
    obj = lambda x: 0.01 * x[0] ** 2 + x[1] ** 2 - 100.0
    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        var_lb=jnp.array([2.0, -50.0]),
        var_ub=jnp.array([50.0, 50.0]),
        linear_coeffs=jnp.array([[10.0, -1.0]]),
        linear_lb=10.0,
        linear_ub=INF,
    )
    return problem, jnp.array([-1.0, -1.0]), -99.96


@_register("hs22")
def hs22():
    obj = lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2
    cons = lambda x: jnp.array([-x[0] - x[1] + 2.0, -(x[0] ** 2) + x[1]])
    p, x0 = _make(
        obj, 2, [2.0, 2.0], cons=cons, m=2, cons_lb=0.0, cons_ub=INF
    )
    return p, x0, 1.0


@_register("hs23")
def hs23():
    obj = lambda x: x[0] ** 2 + x[1] ** 2
    cons = lambda x: jnp.array(
        [
            x[0] + x[1] - 1.0,
            x[0] ** 2 + x[1] ** 2 - 1.0,
            9.0 * x[0] ** 2 + x[1] ** 2 - 9.0,
            x[0] ** 2 - x[1],
            x[1] ** 2 - x[0],
        ]
    )
    p, x0 = _make(
        obj,
        2,
        [3.0, 1.0],
        cons=cons,
        m=5,
        var_lb=-50.0,
        var_ub=50.0,
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 2.0


@_register("hs29")
def hs29():
    obj = lambda x: -x[0] * x[1] * x[2]
    cons = lambda x: jnp.array(
        [-(x[0] ** 2) - 2.0 * x[1] ** 2 - 4.0 * x[2] ** 2 + 48.0]
    )
    p, x0 = _make(
        obj, 3, [1.0, 1.0, 1.0], cons=cons, m=1, cons_lb=0.0, cons_ub=INF
    )
    return p, x0, -16.0 * math.sqrt(2.0)


@_register("hs30")
def hs30():
    obj = lambda x: x[0] ** 2 + x[1] ** 2 + x[2] ** 2
    cons = lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0])
    p, x0 = _make(
        obj,
        3,
        [1.0, 1.0, 1.0],
        cons=cons,
        m=1,
        var_lb=[1.0, -10.0, -10.0],
        var_ub=10.0,
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 1.0


@_register("hs31")
def hs31():
    obj = lambda x: 9.0 * x[0] ** 2 + x[1] ** 2 + 9.0 * x[2] ** 2
    cons = lambda x: jnp.array([x[0] * x[1] - 1.0])
    p, x0 = _make(
        obj,
        3,
        [1.0, 1.0, 1.0],
        cons=cons,
        m=1,
        var_lb=[-10.0, 1.0, -10.0],
        var_ub=[10.0, 10.0, 1.0],
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 6.0


@_register("hs32")
def hs32():
    obj = lambda x: (x[0] + 3.0 * x[1] + x[2]) ** 2 + 4.0 * (x[0] - x[1]) ** 2
    cons = lambda x: jnp.array(
        [
            1.0 - x[0] - x[1] - x[2],
            6.0 * x[1] + 4.0 * x[2] - x[0] ** 3 - 3.0,
        ]
    )
    p, x0 = _make(
        obj,
        3,
        [0.1, 0.7, 0.2],
        cons=cons,
        m=2,
        var_lb=0.0,
        cons_lb=jnp.array([0.0, 0.0]),
        cons_ub=jnp.array([0.0, INF]),
    )
    return p, x0, 1.0


@_register("hs33")
def hs33():
    obj = lambda x: (x[0] - 1.0) * (x[0] - 2.0) * (x[0] - 3.0) + x[2]
    cons = lambda x: jnp.array(
        [
            x[2] ** 2 - x[1] ** 2 - x[0] ** 2,
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 4.0,
        ]
    )
    p, x0 = _make(
        obj,
        3,
        [0.0, 0.0, 3.0],
        cons=cons,
        m=2,
        var_lb=0.0,
        var_ub=[INF, INF, 5.0],
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, math.sqrt(2.0) - 6.0


@_register("hs35")
def hs35():
    obj = lambda x: (
        9.0
        - 8.0 * x[0]
        - 6.0 * x[1]
        - 4.0 * x[2]
        + 2.0 * x[0] ** 2
        + 2.0 * x[1] ** 2
        + x[2] ** 2
        + 2.0 * x[0] * x[1]
        + 2.0 * x[0] * x[2]
    )
    func = Func(obj, num_variables=3)
    problem = Problem(
        func,
        var_lb=0.0,
        linear_coeffs=jnp.array([[1.0, 1.0, 2.0]]),
        linear_lb=-INF,
        linear_ub=3.0,
    )
    return problem, jnp.array([0.5, 0.5, 0.5]), 1.0 / 9.0


@_register("hs36")
def hs36():
    obj = lambda x: -x[0] * x[1] * x[2]
    func = Func(obj, num_variables=3)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=jnp.array([20.0, 11.0, 42.0]),
        linear_coeffs=jnp.array([[1.0, 2.0, 2.0]]),
        linear_lb=-INF,
        linear_ub=72.0,
    )
    return problem, jnp.array([10.0, 10.0, 10.0]), -3300.0


@_register("hs37")
def hs37():
    obj = lambda x: -x[0] * x[1] * x[2]
    func = Func(obj, num_variables=3)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=42.0,
        linear_coeffs=jnp.array([[1.0, 2.0, 2.0]]),
        linear_lb=0.0,
        linear_ub=72.0,
    )
    return problem, jnp.array([10.0, 10.0, 10.0]), -3456.0


@_register("hs43")
def hs43():
    obj = lambda x: (
        x[0] ** 2
        + x[1] ** 2
        + 2.0 * x[2] ** 2
        + x[3] ** 2
        - 5.0 * x[0]
        - 5.0 * x[1]
        - 21.0 * x[2]
        + 7.0 * x[3]
    )
    cons = lambda x: jnp.array(
        [
            8.0
            - x[0] ** 2
            - x[1] ** 2
            - x[2] ** 2
            - x[3] ** 2
            - x[0]
            + x[1]
            - x[2]
            + x[3],
            10.0
            - x[0] ** 2
            - 2.0 * x[1] ** 2
            - x[2] ** 2
            - 2.0 * x[3] ** 2
            + x[0]
            + x[3],
            5.0
            - 2.0 * x[0] ** 2
            - x[1] ** 2
            - x[2] ** 2
            - 2.0 * x[0]
            + x[1]
            + x[3],
        ]
    )
    p, x0 = _make(
        obj, 4, [0.0, 0.0, 0.0, 0.0], cons=cons, m=3, cons_lb=0.0, cons_ub=INF
    )
    return p, x0, -44.0


@_register("hs71")
def hs71():
    obj = lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]
    cons = lambda x: jnp.array([x[0] * x[1] * x[2] * x[3], jnp.vdot(x, x)])
    p, x0 = _make(
        obj,
        4,
        [1.0, 5.0, 5.0, 1.0],
        cons=cons,
        m=2,
        var_lb=1.0,
        var_ub=5.0,
        cons_lb=jnp.array([25.0, 40.0]),
        cons_ub=jnp.array([INF, 40.0]),
    )
    return p, x0, 17.0140173


@_register("hs100")
def hs100():
    obj = lambda x: (
        (x[0] - 10.0) ** 2
        + 5.0 * (x[1] - 12.0) ** 2
        + x[2] ** 4
        + 3.0 * (x[3] - 11.0) ** 2
        + 10.0 * x[4] ** 6
        + 7.0 * x[5] ** 2
        + x[6] ** 4
        - 4.0 * x[5] * x[6]
        - 10.0 * x[5]
        - 8.0 * x[6]
    )
    cons = lambda x: jnp.array(
        [
            127.0
            - 2.0 * x[0] ** 2
            - 3.0 * x[1] ** 4
            - x[2]
            - 4.0 * x[3] ** 2
            - 5.0 * x[4],
            282.0 - 7.0 * x[0] - 3.0 * x[1] - 10.0 * x[2] ** 2 - x[3] + x[4],
            196.0 - 23.0 * x[0] - x[1] ** 2 - 6.0 * x[5] ** 2 + 8.0 * x[6],
            -4.0 * x[0] ** 2
            - x[1] ** 2
            + 3.0 * x[0] * x[1]
            - 2.0 * x[2] ** 2
            - 5.0 * x[5]
            + 11.0 * x[6],
        ]
    )
    p, x0 = _make(
        obj,
        7,
        [1.0, 2.0, 0.0, 4.0, 0.0, 1.0, 1.0],
        cons=cons,
        m=4,
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 680.6300573



@_register("hs16")
def hs16():
    obj = lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
    cons = lambda x: jnp.array([x[0] + x[1] ** 2, x[0] ** 2 + x[1]])
    p, x0 = _make(
        obj,
        2,
        [-2.0, 1.0],
        cons=cons,
        m=2,
        var_lb=[-0.5, -INF],
        var_ub=[0.5, 1.0],
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 0.25


@_register("hs19")
def hs19():
    obj = lambda x: (x[0] - 10.0) ** 3 + (x[1] - 20.0) ** 3
    cons = lambda x: jnp.array(
        [
            (x[0] - 5.0) ** 2 + (x[1] - 5.0) ** 2 - 100.0,
            82.81 - (x[1] - 5.0) ** 2 - (x[0] - 6.0) ** 2,
        ]
    )
    p, x0 = _make(
        obj,
        2,
        [20.1, 5.84],
        cons=cons,
        m=2,
        var_lb=[13.0, 0.0],
        var_ub=[100.0, 100.0],
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, -6961.81388


@_register("hs24")
def hs24():
    s3 = math.sqrt(3.0)
    obj = lambda x: ((x[0] - 3.0) ** 2 - 9.0) * x[1] ** 3 / (27.0 * s3)
    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        var_lb=0.0,
        linear_coeffs=jnp.array(
            [[1.0 / s3, -1.0], [1.0, s3], [-1.0, -s3]]
        ),
        linear_lb=jnp.array([0.0, 0.0, -6.0]),
        linear_ub=jnp.array([INF, INF, INF]),
    )
    return problem, jnp.array([1.0, 0.5]), -1.0


@_register("hs34")
def hs34():
    obj = lambda x: -x[0]
    cons = lambda x: jnp.array([x[1] - jnp.exp(x[0]), x[2] - jnp.exp(x[1])])
    p, x0 = _make(
        obj,
        3,
        [0.0, 1.05, 2.9],
        cons=cons,
        m=2,
        var_lb=0.0,
        var_ub=[100.0, 100.0, 10.0],
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, -math.log(math.log(10.0))


@_register("hs41")
def hs41():
    obj = lambda x: 2.0 - x[0] * x[1] * x[2]
    func = Func(obj, num_variables=4)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=jnp.array([1.0, 1.0, 1.0, 2.0]),
        linear_coeffs=jnp.array([[1.0, 2.0, 2.0, -1.0]]),
        linear_lb=0.0,
        linear_ub=0.0,
    )
    return problem, jnp.array([1.0, 1.0, 1.0, 1.0]), 52.0 / 27.0


@_register("hs44")
def hs44():
    obj = lambda x: (
        x[0]
        - x[1]
        - x[2]
        - x[0] * x[2]
        + x[0] * x[3]
        + x[1] * x[2]
        - x[1] * x[3]
    )
    func = Func(obj, num_variables=4)
    problem = Problem(
        func,
        var_lb=0.0,
        linear_coeffs=jnp.array(
            [
                [1.0, 2.0, 0.0, 0.0],
                [4.0, 1.0, 0.0, 0.0],
                [3.0, 4.0, 0.0, 0.0],
                [0.0, 0.0, 2.0, 1.0],
                [0.0, 0.0, 1.0, 2.0],
                [0.0, 0.0, 1.0, 1.0],
            ]
        ),
        linear_lb=-INF,
        linear_ub=jnp.array([8.0, 12.0, 12.0, 8.0, 8.0, 5.0]),
    )
    return problem, jnp.zeros(4), -15.0


@_register("hs49")
def hs49():
    obj = lambda x: (
        (x[0] - x[1]) ** 2
        + (x[2] - 1.0) ** 2
        + (x[3] - 1.0) ** 4
        + (x[4] - 1.0) ** 6
    )
    func = Func(obj, num_variables=5)
    problem = Problem(
        func,
        linear_coeffs=jnp.array(
            [[1.0, 1.0, 1.0, 4.0, 0.0], [0.0, 0.0, 1.0, 0.0, 5.0]]
        ),
        linear_lb=jnp.array([7.0, 6.0]),
        linear_ub=jnp.array([7.0, 6.0]),
    )
    return problem, jnp.array([10.0, 7.0, 2.0, -3.0, 0.8]), 0.0


@_register("hs50")
def hs50():
    obj = lambda x: (
        (x[0] - x[1]) ** 2
        + (x[1] - x[2]) ** 2
        + (x[2] - x[3]) ** 4
        + (x[3] - x[4]) ** 2
    )
    func = Func(obj, num_variables=5)
    problem = Problem(
        func,
        linear_coeffs=jnp.array(
            [
                [1.0, 2.0, 3.0, 0.0, 0.0],
                [0.0, 1.0, 2.0, 3.0, 0.0],
                [0.0, 0.0, 1.0, 2.0, 3.0],
            ]
        ),
        linear_lb=6.0,
        linear_ub=6.0,
    )
    return problem, jnp.array([35.0, -31.0, 11.0, 5.0, -5.0]), 0.0


@_register("hs53")
def hs53():
    obj = lambda x: (
        (x[0] - x[1]) ** 2
        + (x[1] + x[2] - 2.0) ** 2
        + (x[3] - 1.0) ** 2
        + (x[4] - 1.0) ** 2
    )
    func = Func(obj, num_variables=5)
    problem = Problem(
        func,
        var_lb=-10.0,
        var_ub=10.0,
        linear_coeffs=jnp.array(
            [
                [1.0, 3.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, 1.0, 1.0, -2.0],
                [0.0, 1.0, 0.0, 0.0, -1.0],
            ]
        ),
        linear_lb=0.0,
        linear_ub=0.0,
    )
    return problem, jnp.array([2.0, 2.0, 2.0, 2.0, 2.0]), 176.0 / 43.0


@_register("hs60")
def hs60():
    obj = lambda x: (
        (x[0] - 1.0) ** 2 + (x[0] - x[1]) ** 2 + (x[1] - x[2]) ** 4
    )
    cons = lambda x: jnp.array(
        [x[0] * (1.0 + x[1] ** 2) + x[2] ** 4 - 4.0 - 3.0 * math.sqrt(2.0)]
    )
    p, x0 = _make(
        obj,
        3,
        [2.0, 2.0, 2.0],
        cons=cons,
        m=1,
        var_lb=-10.0,
        var_ub=10.0,
        cons_lb=0.0,
        cons_ub=0.0,
    )
    return p, x0, 0.03256820025


@_register("hs63")
def hs63():
    obj = lambda x: (
        1000.0
        - x[0] ** 2
        - 2.0 * x[1] ** 2
        - x[2] ** 2
        - x[0] * x[1]
        - x[0] * x[2]
    )
    cons = lambda x: jnp.array(
        [
            8.0 * x[0] + 14.0 * x[1] + 7.0 * x[2] - 56.0,
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 25.0,
        ]
    )
    p, x0 = _make(
        obj,
        3,
        [2.0, 2.0, 2.0],
        cons=cons,
        m=2,
        var_lb=0.0,
        cons_lb=0.0,
        cons_ub=0.0,
    )
    return p, x0, 961.7151721


@_register("hs64")
def hs64():
    obj = lambda x: (
        5.0 * x[0]
        + 50000.0 / x[0]
        + 20.0 * x[1]
        + 72000.0 / x[1]
        + 10.0 * x[2]
        + 144000.0 / x[2]
    )
    cons = lambda x: jnp.array(
        [1.0 - 4.0 / x[0] - 32.0 / x[1] - 120.0 / x[2]]
    )
    p, x0 = _make(
        obj,
        3,
        [1.0, 1.0, 1.0],
        cons=cons,
        m=1,
        var_lb=1e-5,
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 6299.842428


@_register("hs65")
def hs65():
    obj = lambda x: (
        (x[0] - x[1]) ** 2
        + (x[0] + x[1] - 10.0) ** 2 / 9.0
        + (x[2] - 5.0) ** 2
    )
    cons = lambda x: jnp.array(
        [48.0 - x[0] ** 2 - x[1] ** 2 - x[2] ** 2]
    )
    p, x0 = _make(
        obj,
        3,
        [-5.0, 5.0, 0.0],
        cons=cons,
        m=1,
        var_lb=[-4.5, -4.5, -5.0],
        var_ub=[4.5, 4.5, 5.0],
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 0.9535288567


@_register("hs76")
def hs76():
    obj = lambda x: (
        x[0] ** 2
        + 0.5 * x[1] ** 2
        + x[2] ** 2
        + 0.5 * x[3] ** 2
        - x[0] * x[2]
        + x[2] * x[3]
        - x[0]
        - 3.0 * x[1]
        + x[2]
        - x[3]
    )
    func = Func(obj, num_variables=4)
    problem = Problem(
        func,
        var_lb=0.0,
        linear_coeffs=jnp.array(
            [
                [1.0, 2.0, 1.0, 1.0],
                [3.0, 1.0, 2.0, -1.0],
                [0.0, -1.0, -4.0, 0.0],
            ]
        ),
        linear_lb=jnp.array([-INF, -INF, -INF]),
        linear_ub=jnp.array([5.0, 4.0, -1.5]),
    )
    return problem, jnp.array([0.5, 0.5, 0.5, 0.5]), -4.681818181


@_register("hs77")
def hs77():
    obj = lambda x: (
        (x[0] - 1.0) ** 2
        + (x[0] - x[1]) ** 2
        + (x[2] - 1.0) ** 2
        + (x[3] - 1.0) ** 4
        + (x[4] - 1.0) ** 6
    )
    cons = lambda x: jnp.array(
        [
            x[0] ** 2 * x[3] + jnp.sin(x[3] - x[4]) - 2.0 * math.sqrt(2.0),
            x[1] + x[2] ** 4 * x[3] ** 2 - 8.0 - math.sqrt(2.0),
        ]
    )
    p, x0 = _make(
        obj,
        5,
        [2.0] * 5,
        cons=cons,
        m=2,
        cons_lb=0.0,
        cons_ub=0.0,
    )
    return p, x0, 0.24150513


@_register("hs78")
def hs78():
    obj = lambda x: x[0] * x[1] * x[2] * x[3] * x[4]
    cons = lambda x: jnp.array(
        [
            jnp.vdot(x, x) - 10.0,
            x[1] * x[2] - 5.0 * x[3] * x[4],
            x[0] ** 3 + x[1] ** 3 + 1.0,
        ]
    )
    p, x0 = _make(
        obj,
        5,
        [-2.0, 1.5, 2.0, -1.0, -1.0],
        cons=cons,
        m=3,
        cons_lb=0.0,
        cons_ub=0.0,
    )
    return p, x0, -2.91970041


@_register("hs79")
def hs79():
    obj = lambda x: (
        (x[0] - 1.0) ** 2
        + (x[0] - x[1]) ** 2
        + (x[1] - x[2]) ** 2
        + (x[2] - x[3]) ** 4
        + (x[3] - x[4]) ** 4
    )
    cons = lambda x: jnp.array(
        [
            x[0] + x[1] ** 2 + x[2] ** 3 - 2.0 - 3.0 * math.sqrt(2.0),
            x[1] - x[2] ** 2 + x[3] + 2.0 - 2.0 * math.sqrt(2.0),
            x[0] * x[4] - 2.0,
        ]
    )
    p, x0 = _make(
        obj,
        5,
        [2.0] * 5,
        cons=cons,
        m=3,
        cons_lb=0.0,
        cons_ub=0.0,
    )
    return p, x0, 0.0787768209


@_register("hs80")
def hs80():
    obj = lambda x: jnp.exp(x[0] * x[1] * x[2] * x[3] * x[4])
    cons = lambda x: jnp.array(
        [
            jnp.vdot(x, x) - 10.0,
            x[1] * x[2] - 5.0 * x[3] * x[4],
            x[0] ** 3 + x[1] ** 3 + 1.0,
        ]
    )
    p, x0 = _make(
        obj,
        5,
        [-2.0, 2.0, 2.0, -1.0, -1.0],
        cons=cons,
        m=3,
        var_lb=[-2.3, -2.3, -3.2, -3.2, -3.2],
        var_ub=[2.3, 2.3, 3.2, 3.2, 3.2],
        cons_lb=0.0,
        cons_ub=0.0,
    )
    return p, x0, 0.0539498478


@_register("hs110")
def hs110():
    def obj(x):
        terms = jnp.log(x - 2.0) ** 2 + jnp.log(10.0 - x) ** 2
        return jnp.sum(terms) - jnp.prod(x) ** 0.2

    p, x0 = _make(obj, 10, [9.0] * 10, var_lb=2.001, var_ub=9.999)
    return p, x0, -45.77846971


@_register("hs113")
def hs113():
    def obj(x):
        return (
            x[0] ** 2
            + x[1] ** 2
            + x[0] * x[1]
            - 14.0 * x[0]
            - 16.0 * x[1]
            + (x[2] - 10.0) ** 2
            + 4.0 * (x[3] - 5.0) ** 2
            + (x[4] - 3.0) ** 2
            + 2.0 * (x[5] - 1.0) ** 2
            + 5.0 * x[6] ** 2
            + 7.0 * (x[7] - 11.0) ** 2
            + 2.0 * (x[8] - 10.0) ** 2
            + (x[9] - 7.0) ** 2
            + 45.0
        )

    def cons(x):
        return jnp.array(
            [
                105.0 - 4.0 * x[0] - 5.0 * x[1] + 3.0 * x[6] - 9.0 * x[7],
                -10.0 * x[0] + 8.0 * x[1] + 17.0 * x[6] - 2.0 * x[7],
                8.0 * x[0] - 2.0 * x[1] - 5.0 * x[8] + 2.0 * x[9] + 12.0,
                -3.0 * (x[0] - 2.0) ** 2
                - 4.0 * (x[1] - 3.0) ** 2
                - 2.0 * x[2] ** 2
                + 7.0 * x[3]
                + 120.0,
                -5.0 * x[0] ** 2
                - 8.0 * x[1]
                - (x[2] - 6.0) ** 2
                + 2.0 * x[3]
                + 40.0,
                -x[0] ** 2
                - 2.0 * (x[1] - 2.0) ** 2
                + 2.0 * x[0] * x[1]
                - 14.0 * x[4]
                + 6.0 * x[5],
                -0.5 * (x[0] - 8.0) ** 2
                - 2.0 * (x[1] - 4.0) ** 2
                - 3.0 * x[4] ** 2
                + x[5]
                + 30.0,
                3.0 * x[0]
                - 6.0 * x[1]
                - 12.0 * (x[8] - 8.0) ** 2
                + 7.0 * x[9],
            ]
        )

    p, x0 = _make(
        obj,
        10,
        [2.0, 3.0, 5.0, 5.0, 1.0, 2.0, 7.0, 3.0, 6.0, 10.0],
        cons=cons,
        m=8,
        cons_lb=0.0,
        cons_ub=INF,
    )
    return p, x0, 24.30620907

HS_PROBLEMS = sorted(_REGISTRY.keys(), key=lambda s: int(s[2:]))
