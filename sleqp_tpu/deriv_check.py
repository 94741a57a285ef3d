"""Finite-difference derivative validation.

TPU-native equivalent of src/main/deriv_check.c: validate the objective
gradient (first order, deriv_check.c:297-331), the constraint Jacobian,
and Hessian products (second order, deriv_check.c:377-533) against forward
finite differences, raising ``InvalidDerivativeError`` when a mismatch
exceeds ``deriv_tol`` (reference raises SLEQP_INVALID_DERIV).

With AD-derived defaults this mostly guards user-*provided* overrides —
the same situation as the reference, where every derivative is user code.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .problem import Problem
from .settings import Settings


class InvalidDerivativeError(RuntimeError):
    """Raised when a derivative check fails (SLEQP_INVALID_DERIV)."""


def _report(kind, index, expected, actual, tol):
    return (
        f"{kind}[{index}]: finite difference {expected:.8e} vs "
        f"provided {actual:.8e} (tol {tol:.1e})"
    )


def check_derivatives(
    problem: Problem,
    x,
    settings: Settings | None = None,
    check_second_order: bool = True,
    raise_on_failure: bool = True,
) -> list[str]:
    """Run the checks at x; returns a list of human-readable findings."""
    settings = settings or Settings()
    h = settings.deriv_perturbation
    tol = settings.deriv_tol

    x = np.asarray(problem.clip_to_bounds(jnp.asarray(x, problem.dtype)))
    n = problem.num_variables
    m = problem.num_cons
    findings: list[str] = []

    f0 = float(problem.obj_val(jnp.asarray(x)))
    g = np.asarray(problem.obj_grad(jnp.asarray(x)))
    c0 = np.asarray(problem.cons_val(jnp.asarray(x)))
    J = np.asarray(problem.cons_jac(jnp.asarray(x)))

    # all n coordinate perturbations as ONE vmapped batch (a python
    # round-trip per coordinate made the check unusable at the banded/
    # OCP scales that most need validation)
    import jax

    xj = jnp.asarray(x)
    perturbed = xj[None, :] + h * jnp.eye(n, dtype=xj.dtype)
    f_all = np.asarray(jax.vmap(problem.obj_val)(perturbed))
    fd_g = (f_all - f0) / h
    bad_g = np.abs(fd_g - g) > tol * (1.0 + np.abs(fd_g))
    for j in np.nonzero(bad_g)[0]:
        findings.append(_report("obj_grad", int(j), fd_g[j], g[j], tol))

    if m:
        c_all = np.asarray(jax.vmap(problem.cons_val)(perturbed))  # (n, m)
        fd_J = (c_all - c0[None, :]) / h  # fd_J[j, i] = dc_i/dx_j
        bad = np.abs(fd_J.T - J) > tol * (1.0 + np.abs(fd_J.T))
        for i, j in zip(*np.nonzero(bad)):
            findings.append(
                _report(
                    f"cons_jac[{int(i)},", int(j), fd_J[j, i], J[i, j], tol
                )
            )

    if check_second_order:
        rng = np.random.default_rng(0)
        mu = jnp.asarray(rng.standard_normal(m)) if m else jnp.zeros((0,))

        def lag_grad(z):
            gg = np.asarray(problem.obj_grad(jnp.asarray(z)))
            if m:
                gg = gg + np.asarray(problem.cons_jac(jnp.asarray(z))).T @ np.asarray(mu)
            return gg

        g0 = lag_grad(x)
        for trial in range(2):
            d = rng.standard_normal(n)
            d /= np.linalg.norm(d)
            hd = np.asarray(problem.hess_prod(jnp.asarray(x), jnp.asarray(d), mu))
            fd = (lag_grad(x + h * d) - g0) / h
            err = np.max(np.abs(fd - hd)) / (1.0 + np.max(np.abs(fd)))
            if err > tol:
                findings.append(
                    f"hess_prod(dir {trial}): max deviation {err:.3e} "
                    f"exceeds tol {tol:.1e}"
                )

    if findings and raise_on_failure:
        raise InvalidDerivativeError("\n".join(findings))
    return findings
