"""Gauss-Newton EQP solver for least-squares functions.

TPU-native equivalent of src/main/gauss_newton.c: for LSQ functions the
EQP step minimizes the linearized residual plus penalty-scaled violated
constraint rows inside the reduced trust region and the working-set null
space:

    min || r(x) + J_r (d0 + t) ||^2
        + penalty * || viol(c + J (d0 + t)) ||^2     over t in null(A_W),
    ||t|| <= reduced_radius

solved with trust-region LSQR (tr/lsqr.c) on the stacked operator
``A = [J_r; sqrt(penalty) * D_viol J] P`` (gauss_newton.c:87-260), where
residual products come from jvp/vjp of the user's residual function
(the reference's lsq_jac_forward/adjoint callbacks, pub_lsq.h:11-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iterate import Iterate
from .merit import make_direction
from .newton import NewtonResult, WorkingStep
from .ops.kkt import AugJac, project_nullspace
from .ops.lsqr import lsqr_tr
from .ops.tr_cg import TRResult
from .problem import LSQFunc, Problem, ProblemData

Array = jax.Array


def compute_gauss_newton_step(
    problem: Problem,
    data: ProblemData,
    it: Iterate,
    aug_jac: AugJac,
    ws: WorkingStep,
    penalty: Array,
    max_iterations: int,
) -> NewtonResult:
    func = problem.func
    assert isinstance(func, LSQFunc)
    n = problem.num_variables

    residuals = func.residuals
    r0, jvp_d0 = jax.jvp(residuals, (it.x,), (ws.step,))
    _, vjp = jax.vjp(residuals, it.x)

    sqrt_pen = jnp.sqrt(penalty)
    viol = ws.violated_mult  # in {-1, 0, +1}, excludes working set

    def forward(t: Array) -> Array:
        p = project_nullspace(aug_jac, t)
        _, jr = jax.jvp(residuals, (it.x,), (p,))
        jc = sqrt_pen * (viol * (it.cons_jac @ p))
        return jnp.concatenate([jr, jc])

    k = func.num_residuals
    m = it.cons_val.shape[0]

    def adjoint(u: Array) -> Array:
        u1 = u[:k]
        u2 = u[k:]
        g = vjp(u1)[0] + sqrt_pen * (it.cons_jac.T @ (viol * u2))
        return project_nullspace(aug_jac, g)

    # rhs: negative residuals at the initial step d0
    bound = jnp.where(viol > 0.0, data.cons_ub, data.cons_lb)
    bound = jnp.where(viol == 0.0, 0.0, bound)
    cons_resid = jnp.where(viol != 0.0, ws.initial_cons_val - bound, 0.0)
    b = -jnp.concatenate([r0 + jvp_d0, sqrt_pen * (viol * cons_resid)])

    t, iters = lsqr_tr(
        forward,
        adjoint,
        b,
        ws.reduced_trust_radius,
        n,
        max_iterations,
    )
    t = project_nullspace(aug_jac, t)

    zero_radius = ws.reduced_trust_radius <= 1e-20
    step = jnp.where(zero_radius, ws.step, ws.step + t)

    hd = problem.hess_prod(it.x, step, it.cons_dual)
    direction = make_direction(it, step, hd)
    dtype = step.dtype
    tr = TRResult(
        step=t,
        on_boundary=jnp.linalg.norm(t)
        >= ws.reduced_trust_radius * (1.0 - 1e-10),
        iterations=iters,
        min_rayleigh=jnp.asarray(0.0, dtype=dtype),
        max_rayleigh=jnp.asarray(0.0, dtype=dtype),
    )
    return NewtonResult(direction=direction, tr=tr)
