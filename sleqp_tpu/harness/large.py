"""Large-scale (n >= 10^4) banded suite problems.

The reference's CUTEst sweep includes MASTSIF problems up to n ~ 10^4-10^5,
reached through sparse aug-Jacobian assembly + sparse factorizations
(src/test/cutest/CMakeLists.txt:1-30, src/main/aug_jac/standard_aug_jac.c).
The TPU-native equivalent is the block-banded structured path (banded.py):
these entries route n >= 10^4 NLPs through the SAME harness/CSV pipeline as
the tiny and medium sets, so the scale claim is reproducible end-to-end
(sleqp_cutest_driver.c:104-121 schema), not just via bench.py.

Each entry returns (BandedProblem, X0, f_opt) — the driver detects the
BandedProblem type and solves through banded_solve.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..banded import BandedProblem

_REGISTRY: dict[str, Callable] = {}


def _register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_problem(name: str):
    return _REGISTRY[name]()


@_register("bandqp10k")
def bandqp10k():
    """Convex banded QP, n = 10240: separable quadratic pulled against
    linear coupling rows |S (x_{t+1} - x_t)| <= 0.2 and the box
    |x| <= 1.5.  The target profile is infeasible for the couplings, so
    a substantial active set forms.  f_opt unknown analytically (None);
    the contract is the KKT residuals in the CSV."""
    N, k, q = 160, 64, 16
    rng = np.random.default_rng(7)
    W = jnp.asarray(rng.standard_normal((N, k)))
    S = jnp.asarray(rng.standard_normal((N - 1, q, k)) * 0.4)

    def obj(x, t):
        return jnp.sum((x - W[t]) ** 2)

    def cons(a, b, t):
        return S[t] @ (b - a)

    p = BandedProblem(
        obj,
        N,
        k,
        cons_block=cons,
        cons_per_block=q,
        var_lb=-1.5,
        var_ub=1.5,
        cons_lb=-0.2,
        cons_ub=0.2,
    )
    return p, jnp.zeros((N, k)), None


@_register("bandrosen10k")
def bandrosen10k():
    """Chained-Rosenbrock banded NLP, n = 10240 (nonconvex; CUTEst
    CHNROSNB family): Rosenbrock valleys inside each block plus
    nonlinear coupling constraints between adjacent blocks.  With the
    couplings inactive at the known unconstrained optimum x = 1, f* = 0
    — the entry checks the solver recovers it through the banded path."""
    N, k, q = 160, 64, 8
    rng = np.random.default_rng(11)
    S = jnp.asarray(rng.standard_normal((N - 1, q, k)) * 0.1)

    def obj(x, t):
        return jnp.sum(
            100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
        )

    def cons(a, b, t):
        # zero at a == b == 1 (both couplings vanish), comfortably
        # inside the bounds there
        return S[t] @ (b - a) + 0.01 * (S[t] @ (a - b)) ** 2

    p = BandedProblem(
        obj,
        N,
        k,
        cons_block=cons,
        cons_per_block=q,
        var_lb=-5.0,
        var_ub=5.0,
        cons_lb=-1.0,
        cons_ub=1.0,
    )
    return p, jnp.full((N, k), -1.2), 0.0


@_register("bandnl16k")
def bandnl16k():
    """Nonlinear banded NLP, n = 16384: nonconvex objective (quadratic +
    cosine ripple) with quadratic coupling constraints — the bench.py
    configuration scaled up 1.6x (BASELINE config 3 done-criterion is
    n >= 10^4 to 1e-6 in block-banded memory)."""
    N, k, q = 256, 64, 16
    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.standard_normal((N, k)) * 0.5)
    S = jnp.asarray(rng.standard_normal((N - 1, q, k)) * 0.3)

    def obj(x, t):
        return jnp.sum((x - W[t]) ** 2) + 0.1 * jnp.sum(jnp.cos(x))

    def cons(a, b, t):
        return S[t] @ (b - a) + 0.05 * (S[t] @ a) ** 2

    p = BandedProblem(
        obj,
        N,
        k,
        cons_block=cons,
        cons_per_block=q,
        var_lb=-2.0,
        var_ub=2.0,
        cons_lb=-0.3,
        cons_ub=0.3,
    )
    return p, jnp.zeros((N, k)), None


LARGE_PROBLEMS = sorted(_REGISTRY.keys())
