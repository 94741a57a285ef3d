"""Analytic NLP test fixtures with known optima.

Mirrors the reference's fixture strategy (SURVEY.md §4): tiny analytic
problems — Rosenbrock, quadratic+quadratic-constraint, HS71, the
Wächter-Biegler restoration pathology — defined as plain jnp functions with
AD-derived derivatives.

References: src/test/rosenbrock_fixture.c, quadfunc_fixture.c,
quadcons_fixture.c, constrained_fixture.c (HS71), wachbieg_fixture.c.
"""

import jax.numpy as jnp
import numpy as np

from sleqp_tpu import Func, LSQFunc, Problem


def rosenbrock_problem():
    """Unconstrained 2-d Rosenbrock; optimum (1, 1)."""

    def obj(x):
        a, b = 1.0, 100.0
        return (a - x[0]) ** 2 + b * (x[1] - x[0] ** 2) ** 2

    func = Func(obj, num_variables=2)
    problem = Problem(func)
    x0 = jnp.array([0.0, 0.0])
    x_opt = np.array([1.0, 1.0])
    return problem, x0, x_opt


def quadfunc_problem():
    """min x'x over box [-10, 10]^2; optimum (0, 0)."""

    def obj(x):
        return jnp.vdot(x, x)

    func = Func(obj, num_variables=2)
    problem = Problem(func, var_lb=-10.0, var_ub=10.0)
    x0 = jnp.array([2.0, 3.0])
    x_opt = np.array([0.0, 0.0])
    return problem, x0, x_opt


def quadcons_problem():
    """Quadratic objective + quadratic constraints (quadcons_fixture.c).

    min x0^2 + x1^2  s.t.  x0^2 + x1^2 <= 1,  x1^2 + x0 <= 1,
    0 <= x <= 1; optimum (0, 0).
    """

    def obj(x):
        return x[0] ** 2 + x[1] ** 2

    def cons(x):
        return jnp.array([x[0] ** 2 + x[1] ** 2, x[1] ** 2 + x[0]])

    func = Func(obj, num_variables=2, cons=cons, num_cons=2)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=1.0,
        general_lb=-jnp.inf,
        general_ub=1.0,
    )
    x0 = jnp.array([0.5, 0.5])
    x_opt = np.array([0.0, 0.0])
    return problem, x0, x_opt


def hs71_problem():
    """Hock-Schittkowski 71 (constrained_fixture.c, 'cutest problem HS71').

    min x0*x3*(x0+x1+x2) + x2
    s.t. x0*x1*x2*x3 >= 25, sum(x^2) == 40, 1 <= x <= 5.
    """

    def obj(x):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]

    def cons(x):
        return jnp.array([x[0] * x[1] * x[2] * x[3], jnp.vdot(x, x)])

    func = Func(obj, num_variables=4, cons=cons, num_cons=2)
    problem = Problem(
        func,
        var_lb=1.0,
        var_ub=5.0,
        general_lb=jnp.array([25.0, 40.0]),
        general_ub=jnp.array([jnp.inf, 40.0]),
    )
    x0 = jnp.array([1.0, 5.0, 5.0, 1.0])
    x_opt = np.array([1.0, 4.742999, 3.821151, 1.379408])
    return problem, x0, x_opt


def wachbieg_problem():
    """Wächter-Biegler pathology (wachbieg_fixture.c).

    min x0  s.t.  x0^2 - x1 - 1 == 0,  x0 - x2 - 0.5 == 0,
    x1 >= 0, x2 >= 0; starting point (-2, 1, 1).
    A known solution is (1, 0, 0.5); line-search SQP without a restoration
    phase stalls on this problem.
    """

    def obj(x):
        return x[0]

    def cons(x):
        return jnp.array([x[0] ** 2 - x[1] - 1.0, x[0] - x[2] - 0.5])

    func = Func(obj, num_variables=3, cons=cons, num_cons=2)
    problem = Problem(
        func,
        var_lb=jnp.array([-jnp.inf, 0.0, 0.0]),
        var_ub=jnp.inf,
        general_lb=0.0,
        general_ub=0.0,
    )
    x0 = jnp.array([-2.0, 1.0, 1.0])
    x_opt = np.array([1.0, 0.0, 0.5])
    return problem, x0, x_opt


def rosenbrock_lsq_problem():
    """Rosenbrock as least squares (rosenbrock_lsq_fixture.c)."""

    def residuals(x):
        return jnp.array([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])

    func = LSQFunc(residuals, num_variables=2, num_residuals=2)
    problem = Problem(func)
    x0 = jnp.array([0.0, 0.0])
    x_opt = np.array([1.0, 1.0])
    return problem, x0, x_opt


def linear_problem():
    """Pure LP as an NLP: min -x0 - 2*x1 s.t. x0 + x1 <= 1, x >= 0.

    Optimum (0, 1), objective -2.
    """

    def obj(x):
        return -x[0] - 2.0 * x[1]

    func = Func(obj, num_variables=2)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=jnp.inf,
        linear_coeffs=jnp.array([[1.0, 1.0]]),
        linear_lb=-jnp.inf,
        linear_ub=1.0,
    )
    x0 = jnp.array([0.0, 0.0])
    x_opt = np.array([0.0, 1.0])
    return problem, x0, x_opt


def hs6_problem():
    """HS6: min (1-x0)^2 s.t. 10*(x1 - x0^2) == 0; optimum (1, 1)."""

    def obj(x):
        return (1.0 - x[0]) ** 2

    def cons(x):
        return jnp.array([10.0 * (x[1] - x[0] ** 2)])

    func = Func(obj, num_variables=2, cons=cons, num_cons=1)
    problem = Problem(func, general_lb=0.0, general_ub=0.0)
    x0 = jnp.array([-1.2, 1.0])
    x_opt = np.array([1.0, 1.0])
    return problem, x0, x_opt


def hs35_problem():
    """HS35 (Beale): convex QP, optimum (4/3, 7/9, 4/9), f* = 1/9."""

    def obj(x):
        return (
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

    func = Func(obj, num_variables=3, psd_hessian=True)
    problem = Problem(
        func,
        var_lb=0.0,
        var_ub=jnp.inf,
        linear_coeffs=jnp.array([[1.0, 1.0, 2.0]]),
        linear_lb=-jnp.inf,
        linear_ub=3.0,
    )
    x0 = jnp.array([0.5, 0.5, 0.5])
    x_opt = np.array([4.0 / 3.0, 7.0 / 9.0, 4.0 / 9.0])
    return problem, x0, x_opt
