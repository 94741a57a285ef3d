"""Limited-memory quasi-Newton Hessian approximations.

TPU-native equivalent of src/main/quasi_newton/: damped limited-memory BFGS
with optional centered Oren-Luenberger sizing (bfgs.c) and limited-memory
SR1 (sr1.c), both as *fixed-size ring buffers* inside the jitted solver
state (pairs shift through (W, n) arrays; empty slots are masked).

Semantics follow the reference:

* pairs (s, y) are pushed on accepted steps with the Lagrangian gradient
  difference at the *new* multipliers (solver.c / quasi_newton.c:140)
* BFGS: Powell damping with factor 0.2 (bfgs.c:12), product recursion
  p <- sizing_j * (p - Bs_j (Bs_j.d)/(s.Bs_j)) + r_j (r_j.d)/(s.r_j)
  (bfgs.c:300-346), initial scale s.s/(y.s) clamped to [1e-6, 1] when
  damped (bfgs.c:349-379), centered-OL sizing clamped to [0.1, 1]
  (bfgs.c:381-430)
* SR1: rank-one terms r_j = y_j - B_j s_j with the standard skip rule
  |r.s| >= 1e-8 ||r|| ||s|| (sr1.c:12-40)

The window W is small (default 5) and static, so the push recomputation
(O(W^2) vector ops) unrolls into straight-line XLA code.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .types import HessEval

Array = jax.Array

DAMPING_FACTOR = 0.2  # bfgs.c:12
SIZING_CUTOFF = 0.1  # bfgs.c:13
INITIAL_SCALE_MIN = 1e-6  # bfgs.c:15
DAMPED_INITIAL_SCALE_MAX = 1.0  # bfgs.c:16
SR1_SKIP_FACTOR = 1e-8  # sr1.c skip rule


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QNState:
    """Ring buffer of pairs + derived products (newest in slot W-1)."""

    S: Array  # (W, n) point diffs s
    Y: Array  # (W, n) raw gradient diffs y
    P: Array  # (W, n) products B_j s_j (BFGS) / unused (SR1 stores r_j here)
    R: Array  # (W, n) damped grad diffs r_j (BFGS) / y - Bs (SR1)
    bidir: Array  # (W,) s^T B s  (BFGS)
    rdot: Array  # (W,) s^T r
    sizing: Array  # (W,) per-term sizing factor
    scale: Array  # scalar initial scale
    count: Array  # int32 number of valid pairs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QNPrev:
    """Previous-iterate data for the next pair push (global, not per
    Hessian block)."""

    x: Array  # (n,)
    grad: Array  # (n,)
    jac: Array  # (m, n)
    pending: Array  # bool: a pair should be pushed next iteration


def qn_prev_init(n: int, m: int, dtype) -> QNPrev:
    return QNPrev(
        x=jnp.zeros((n,), dtype=dtype),
        grad=jnp.zeros((n,), dtype=dtype),
        jac=jnp.zeros((m, n), dtype=dtype),
        pending=jnp.asarray(False),
    )


def qn_init(n: int, window: int, dtype, blocks: tuple | None = None):
    """Ring-buffer state; with ``blocks`` a tuple of per-block states."""
    if blocks is not None:
        return tuple(qn_init(e - s, window, dtype) for s, e in blocks)
    W = window
    zeros_wn = jnp.zeros((W, n), dtype=dtype)
    return QNState(
        S=zeros_wn,
        Y=zeros_wn,
        P=zeros_wn,
        R=zeros_wn,
        bidir=jnp.ones((W,), dtype=dtype),
        rdot=jnp.ones((W,), dtype=dtype),
        sizing=jnp.ones((W,), dtype=dtype),
        scale=jnp.asarray(1.0, dtype=dtype),
        count=jnp.asarray(0, jnp.int32),
    )


def _valid_mask(count: Array, W: int) -> Array:
    idx = jnp.arange(W)
    return idx >= (W - count)


def _bfgs_apply(qn: QNState, d: Array, upto: int, valid: Array) -> Array:
    """Product with the approximation built from terms [0, upto).

    Invalid slots are sanitized on push (P=R=0, bidir=rdot=sizing=1) so
    applying them is a no-op; no extra masking needed here.
    """
    p = qn.scale * d
    for j in range(upto):
        term = (
            qn.sizing[j]
            * (p - qn.P[j] * (jnp.vdot(qn.P[j], d) / qn.bidir[j]))
            + qn.R[j] * (jnp.vdot(qn.R[j], d) / qn.rdot[j])
        )
        p = jnp.where(valid[j], term, p)
    return p


def bfgs_product(qn: QNState, d: Array) -> Array:
    """B d using every stored term (bfgs.c:283-346)."""
    W = qn.S.shape[0]
    valid = _valid_mask(qn.count, W)
    full = _bfgs_apply(qn, d, W, valid)
    return jnp.where(qn.count == 0, d, full)


def bfgs_push(qn: QNState, s: Array, y: Array, damped: bool, sizing: bool) -> QNState:
    """Shift in a pair and recompute all derived products (bfgs.c:432-540)."""
    W = qn.S.shape[0]
    dtype = s.dtype

    S = jnp.roll(qn.S, -1, axis=0).at[-1].set(s)
    Y = jnp.roll(qn.Y, -1, axis=0).at[-1].set(y)
    count = jnp.minimum(qn.count + 1, W)
    valid = _valid_mask(count, W)

    # initial scale from the newest pair (bfgs.c:349-379)
    ys = jnp.vdot(y, s)
    ss = jnp.vdot(s, s)
    scale = jnp.where(ys != 0.0, ss / jnp.where(ys != 0.0, ys, 1.0), 1.0)
    scale = jnp.maximum(scale, INITIAL_SCALE_MIN)
    if damped:
        scale = jnp.minimum(scale, DAMPED_INITIAL_SCALE_MAX)

    work = QNState(
        S=S,
        Y=Y,
        P=jnp.zeros_like(S),
        R=jnp.zeros_like(S),
        bidir=jnp.ones((W,), dtype=dtype),
        rdot=jnp.ones((W,), dtype=dtype),
        sizing=jnp.ones((W,), dtype=dtype),
        scale=scale,
        count=count,
    )

    ys_all = jnp.einsum("wn,wn->w", S, Y)  # (y^T s) per slot
    ss_all = jnp.einsum("wn,wn->w", S, S)

    for j in range(W):
        s_j = S[j]
        y_j = Y[j]
        Bs = _bfgs_apply(work, s_j, j, valid)
        bid = jnp.vdot(s_j, Bs)
        bid = jnp.where(bid > 0.0, bid, 1.0)
        dot = ys_all[j]

        if damped:
            needs_damp = dot < DAMPING_FACTOR * bid
            theta = (
                (1.0 - DAMPING_FACTOR)
                * bid
                / jnp.where(needs_damp, bid - dot, 1.0)
            )
            r_j = jnp.where(needs_damp, theta * y_j + (1.0 - theta) * Bs, y_j)
            dot = jnp.where(needs_damp, jnp.vdot(r_j, s_j), dot)
        else:
            r_j = y_j
        dot = jnp.where(dot > 0.0, dot, 1.0)

        # centered Oren-Luenberger sizing (bfgs.c:381-430)
        size_j = jnp.asarray(1.0, dtype=dtype)
        if sizing and j > 0:
            i = j - 1
            prev_valid = valid[j] & valid[i]
            num = 0.5 * ys_all[i] / jnp.where(
                ss_all[i] != 0.0, ss_all[i], 1.0
            ) + 0.5 * ys_all[j] / jnp.where(ss_all[j] != 0.0, ss_all[j], 1.0)
            den = 0.5 * work.rdot[i] / jnp.where(
                ss_all[i] != 0.0, ss_all[i], 1.0
            ) + 0.5 * bid
            factor = num / jnp.where(den != 0.0, den, 1.0)
            factor = jnp.clip(factor, SIZING_CUTOFF, 1.0)
            size_j = jnp.where(prev_valid, factor, 1.0)

        work = dataclasses.replace(
            work,
            P=work.P.at[j].set(jnp.where(valid[j], Bs, 0.0)),
            R=work.R.at[j].set(jnp.where(valid[j], r_j, 0.0)),
            bidir=work.bidir.at[j].set(jnp.where(valid[j], bid, 1.0)),
            rdot=work.rdot.at[j].set(jnp.where(valid[j], dot, 1.0)),
            sizing=work.sizing.at[j].set(size_j),
        )

    return work


def sr1_product(qn: QNState, d: Array) -> Array:
    """B d = scale*d + sum r_j (r_j.d)/(r_j.s_j) (sr1.c).

    Skipped/invalid slots store R=0, rdot=1 and contribute nothing.
    """
    p = qn.scale * d
    for j in range(qn.S.shape[0]):
        p = p + qn.R[j] * (jnp.vdot(qn.R[j], d) / qn.rdot[j])
    return jnp.where(qn.count == 0, d, p)


def sr1_push(qn: QNState, s: Array, y: Array) -> QNState:
    """Rank-one recompute with the SR1 skip rule (sr1.c:12-40)."""
    W = qn.S.shape[0]
    dtype = s.dtype
    S = jnp.roll(qn.S, -1, axis=0).at[-1].set(s)
    Y = jnp.roll(qn.Y, -1, axis=0).at[-1].set(y)
    count = jnp.minimum(qn.count + 1, W)
    valid = _valid_mask(count, W)

    ys = jnp.vdot(y, s)
    ss = jnp.vdot(s, s)
    scale = jnp.where(ys != 0.0, ss / jnp.where(ys != 0.0, ys, 1.0), 1.0)
    scale = jnp.abs(scale)
    scale = jnp.maximum(scale, INITIAL_SCALE_MIN)

    work = dataclasses.replace(
        qn,
        S=S,
        Y=Y,
        R=jnp.zeros_like(S),
        rdot=jnp.ones((W,), dtype=dtype),
        scale=scale,
        count=count,
    )

    for j in range(W):
        s_j, y_j = S[j], Y[j]
        Bs = sr1_product_upto(work, s_j, j, valid)
        r_j = y_j - Bs
        rs = jnp.vdot(r_j, s_j)
        keep = jnp.abs(rs) >= SR1_SKIP_FACTOR * jnp.linalg.norm(
            r_j
        ) * jnp.linalg.norm(s_j)
        use = valid[j] & keep
        work = dataclasses.replace(
            work,
            R=work.R.at[j].set(jnp.where(use, r_j, 0.0)),
            rdot=work.rdot.at[j].set(jnp.where(use, rs, 1.0)),
        )
    return work


def sr1_product_upto(qn: QNState, d: Array, upto: int, valid: Array) -> Array:
    p = qn.scale * d
    for j in range(upto):
        p = p + qn.R[j] * (jnp.vdot(qn.R[j], d) / qn.rdot[j])
    return p


def qn_product(
    qn, d: Array, hess_eval: HessEval, blocks: tuple | None = None
) -> Array:
    """B d; with ``blocks`` (a Func.hess_struct), ``qn`` is a tuple of
    per-block states and the product assembles block-wise — variables in
    the linear range (outside every block) get zero curvature rows
    (reference bfgs.c block handling via SleqpHessStruct)."""
    if blocks is not None:
        out = jnp.zeros_like(d)
        for (start, end), q in zip(blocks, qn):
            out = out.at[start:end].set(
                _qn_product_one(q, d[start:end], hess_eval)
            )
        return out
    return _qn_product_one(qn, d, hess_eval)


def _qn_product_one(qn: QNState, d: Array, hess_eval: HessEval) -> Array:
    if hess_eval in (HessEval.SIMPLE_BFGS, HessEval.DAMPED_BFGS):
        return bfgs_product(qn, d)
    if hess_eval == HessEval.SR1:
        return sr1_product(qn, d)
    raise ValueError(f"qn_product called with {hess_eval}")


def qn_push(
    qn,
    s: Array,
    y: Array,
    hess_eval: HessEval,
    sizing: bool,
    blocks: tuple | None = None,
):
    if blocks is not None:
        return tuple(
            _qn_push_one(q, s[start:end], y[start:end], hess_eval, sizing)
            for (start, end), q in zip(blocks, qn)
        )
    return _qn_push_one(qn, s, y, hess_eval, sizing)


def _qn_push_one(
    qn: QNState, s: Array, y: Array, hess_eval: HessEval, sizing: bool
) -> QNState:
    if hess_eval == HessEval.SIMPLE_BFGS:
        return bfgs_push(qn, s, y, damped=False, sizing=sizing)
    if hess_eval == HessEval.DAMPED_BFGS:
        return bfgs_push(qn, s, y, damped=True, sizing=sizing)
    if hess_eval == HessEval.SR1:
        return sr1_push(qn, s, y)
    raise ValueError(f"qn_push called with {hess_eval}")
