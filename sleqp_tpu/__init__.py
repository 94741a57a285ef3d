"""sleqp_tpu: a TPU-native large-scale NLP solver.

A from-scratch JAX/XLA implementation of the Byrd et al. SLP-EQP active-set
method (the algorithm realized by the reference C library SLEQP): each
iteration solves an LP over the linearized l1-penalty function inside an
l-inf trust region to estimate the active set, then an equality-constrained
QP on that working set via projected-CG trust-region iterations, blended by
a specialized linesearch and globalized with an l1 merit function.

Design: pure functions over fixed-shape pytree state, `lax.while_loop` state
machines instead of reverse communication, masking instead of dynamic
working-set sizes, `vmap` for instance batching, and `shard_map`+psum for
multi-host scenario batches.
"""

from __future__ import annotations

import jax

# NLP tolerances (1e-6 KKT residua) demand double precision accumulation.
# TPU executes f64 via emulation; the hot MXU kernels downcast internally
# where safe.  A float32 fast path is selected via Settings(dtype=...).
jax.config.update("jax_enable_x64", True)

from .settings import Settings, read_settings_file, read_settings_string  # noqa: E402
from .types import (  # noqa: E402
    ActiveState,
    CauchyObjective,
    DualEstimationType,
    HessEval,
    InitialTRChoice,
    Linesearch,
    MathError,
    Polishing,
    SolverPhase,
    Status,
    StepRule,
    StepType,
    TRSolver,
)
from .problem import Func, LSQFunc, Problem  # noqa: E402
from .iterate import Iterate, create_iterate, kkt_residuals  # noqa: E402
from .merit import Direction, merit_func, merit_linear, merit_quadratic  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "ActiveState",
    "CauchyObjective",
    "Direction",
    "DualEstimationType",
    "Func",
    "HessEval",
    "InitialTRChoice",
    "Iterate",
    "LSQFunc",
    "Linesearch",
    "Polishing",
    "Problem",
    "Settings",
    "SolverPhase",
    "Status",
    "StepRule",
    "StepType",
    "TRSolver",
    "create_iterate",
    "kkt_residuals",
    "merit_func",
    "merit_linear",
    "merit_quadratic",
    "read_settings_file",
    "read_settings_string",
]


def __getattr__(name: str):
    # Lazy imports for heavier submodules to keep import time low.
    if name == "minimize":
        from .minimize import minimize as _minimize

        return _minimize
    if name == "Solver":
        from .solver import Solver as _Solver

        return _Solver
    if name == "Scaling":
        from .scale import Scaling as _Scaling

        return _Scaling
    if name == "ScaledProblem":
        from .scale import ScaledProblem as _SP

        return _SP
    if name == "derive_scaling":
        from .scale import derive_scaling as _ds

        return _ds
    if name == "SparseProblem":
        from .sparse import SparseProblem as _SparseP

        return _SparseP
    if name == "sparse_solve":
        from .sparse import sparse_solve as _ss

        return _ss
    if name == "BlockStructuredProblem":
        from .ocp import BlockStructuredProblem as _BSP

        return _BSP
    if name == "ocp_solve":
        from .ocp import ocp_solve as _ocp_solve

        return _ocp_solve
    if name == "BandedProblem":
        from .banded import BandedProblem as _BP

        return _BP
    if name == "banded_solve":
        from .banded import banded_solve as _banded_solve

        return _banded_solve
    raise AttributeError(f"module 'sleqp_tpu' has no attribute {name!r}")
