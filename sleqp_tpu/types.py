"""Core enums and status codes.

TPU-native re-design of the reference's enum/type layer
(reference: src/main/pub_types.h:23-217).  All enums are plain IntEnums so
they can be stored inside jit-compiled integer state without boxing.
"""

from __future__ import annotations

import contextlib
import enum
import warnings

import jax


class Status(enum.IntEnum):
    """Solver status (reference: pub_types.h SLEQP_STATUS)."""

    UNKNOWN = 0
    RUNNING = 1
    OPTIMAL = 2
    INFEASIBLE = 3
    UNBOUNDED = 4
    ABORT_DEADPOINT = 5
    ABORT_ITER = 6
    ABORT_MANUAL = 7
    ABORT_TIME = 8


class ActiveState(enum.IntEnum):
    """Active-set state per variable/constraint (pub_types.h:42-53).

    Stored as int8 arrays of length n (vars) and m (cons) instead of the
    reference's dynamically-sized working-set container: fixed shapes are
    required under jit/vmap.
    """

    INACTIVE = 0
    ACTIVE_LOWER = 1
    ACTIVE_UPPER = 2
    ACTIVE_BOTH = 3


class BaseStat(enum.IntEnum):
    """LP basis status per column (reference: lp/lpi_types.h:12-18)."""

    LOWER = 0
    UPPER = 1
    BASIC = 2
    ZERO = 3  # nonbasic free variable at zero


class CauchyObjective(enum.IntEnum):
    """LP objective type (reference: cauchy/cauchy_types.h:8-14)."""

    DEFAULT = 0
    FEAS = 1
    MIXED = 2


class StepType(enum.IntEnum):
    """Last step classification (pub_types.h SLEQP_STEPTYPE)."""

    NONE = 0
    ACCEPTED = 1
    ACCEPTED_FULL = 2
    ACCEPTED_SOC = 3
    REJECTED = 4


class DualEstimationType(enum.IntEnum):
    """How duals are estimated (pub_types.h:127-132)."""

    LP = 0
    LSQ = 1
    MIXED = 2


class StepRule(enum.IntEnum):
    """Step acceptance rules (pub_types.h SLEQP_STEP_RULE)."""

    DIRECT = 0
    WINDOW = 1
    MINSTEP = 2


class Linesearch(enum.IntEnum):
    """Trial-point linesearch flavor (pub_types.h:162-166)."""

    APPROX = 0
    EXACT = 1


class HessEval(enum.IntEnum):
    """Hessian evaluation mode (pub_types.h:104-110)."""

    EXACT = 0
    SIMPLE_BFGS = 1
    DAMPED_BFGS = 2
    SR1 = 3


class BfgsSizing(enum.IntEnum):
    """BFGS initial-scaling strategy (pub_types.h:112-116)."""

    NONE = 0
    CENTERED_OL = 1


class TRSolver(enum.IntEnum):
    """Trust-region subproblem solver (tr/tr_types.h)."""

    AUTO = 0
    CG = 1  # Steihaug projected CG
    GLTR = 2  # Lanczos / GLTR (trlib equivalent)
    LSQR = 3


class LPSolver(enum.IntEnum):
    """Cauchy LP backend (TPU-native analogue of the reference's
    build-time LP backend choice, lp/lpi_types.h + cmake/SearchLPS.cmake;
    here a runtime setting because both backends are built in).

    AUTO picks parallel vertex enumeration for tiny LPs (every basis
    evaluated at once, no sequential pivot chain at all — the fast path
    for batched small NLPs on TPU, ops/lp_enum.py), the revised simplex
    below ``pdlp_threshold`` LP columns (exact vertex solutions, cheap
    warm-started pivots), and the first-order PDLP kernel above it (pure
    matvecs — the scalable choice for huge n on the MXU)."""

    AUTO = 0
    SIMPLEX = 1
    PDLP = 2
    ENUM = 3


class Polishing(enum.IntEnum):
    """Post-solve working set polishing (pub_types.h:142-147)."""

    NONE = 0
    ZERO_DUAL = 1
    INACTIVE = 2


class ParametricCauchy(enum.IntEnum):
    """Parametric Cauchy mode (pub_types.h:149-154)."""

    DISABLED = 0
    COARSE = 1
    FINE = 2


class AugJacMethod(enum.IntEnum):
    """How augmented-Jacobian systems are solved (pub_types.h:190-196)."""

    AUTO = 0
    STANDARD = 1
    REDUCED = 2
    DIRECT = 3


class InitialTRChoice(enum.IntEnum):
    """Initial trust-region radius choice (pub_types.h:156-160).

    NARROW is the choice suggested in the original SLP-EQP paper,
    WIDE the Knitro default (problem_solver.c:92-105)."""

    NARROW = 0
    WIDE = 1


class SolverPhase(enum.IntEnum):
    """Top-level solver phase (reference: solver/phase.c)."""

    OPTIMIZATION = 0
    RESTORATION = 1


# Numeric "infinity" used for LP bound arithmetic; values with magnitude
# >= INF_THRESHOLD are treated as infinite (the reference uses
# sleqp_infinity() = 1e20 semantics, src/main/cmp.c).
INF = 1e20
INF_THRESHOLD = 1e19


@contextlib.contextmanager
def f32_compute_scope():
    """Trace-time float32 scope for mixed-precision derivative assembly.

    ``jax.enable_x64(False)`` demotes float64 constants closed over by
    user callables to float32 — intentionally, but JAX emits a
    "requested dtype float64 ... truncated to float32" UserWarning per
    demotion, which looks like a bug to users of the mixed
    configuration.  This scope silences exactly that warning.

    Deliberately does NOT force ``jax.default_matmul_precision``: TPU
    f32 matmuls default to bf16 MXU multiplies, and for *derivative
    assembly* that inexactness is just a backward perturbation the
    delta-form outer iteration absorbs (measured: forcing 6-pass true
    f32 here cost the OCP path ~27% per iteration for no accuracy the
    f64 residuals could see).  The one place true-f32 passes are
    REQUIRED — the mixed block-tridiagonal factorization, whose
    refinement loop diverges under bf16 rounding at 1e4-scale
    conditioning — forces it internally
    (ops/pallas_tridiag.block_tridiag_solve_mp)."""
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore",
            message=".*truncated to dtype float32.*",
            category=UserWarning,
        )
        with jax.enable_x64(False):
            yield


class MathError(ArithmeticError):
    """A numerical invariant failed (SLEQP_MATH_ERROR analogue,
    fail.h / math_error.h): raised by host loops when
    ``settings.num_asserts`` detects an inconsistency; the bitmask names
    which check fired (problem_solver.SolverState.num_assert_fail)."""

    BITS = {
        1: "direction bundle inconsistent (direction.c check)",
        2: "model merit mismatch (trial_point.c:760-790)",
        4: "non-finite solver quantity",
    }

    def __init__(self, bitmask):
        if isinstance(bitmask, str):
            # float-exception surveillance path (settings
            # float_error_flags): a message, not an invariant bitmask
            self.bitmask = 4
            super().__init__(bitmask)
            return
        self.bitmask = int(bitmask)
        parts = [
            msg for bit, msg in self.BITS.items() if self.bitmask & bit
        ]
        super().__init__(
            f"numerical assert failed (mask {self.bitmask}): "
            + "; ".join(parts)
        )
