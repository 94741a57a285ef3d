"""Benchmark harness: Hock-Schittkowski suite + CSV driver.

TPU-native equivalent of the reference CUTEst driver
(src/test/cutest/sleqp_cutest_main.c, sleqp_cutest_driver.c): a built-in
set of analytic NLPs with known optima, solved one-by-one or as vmapped
cohorts, emitting the reference's CSV schema.
"""

from .hs import HS_PROBLEMS, get_problem  # noqa: F401
from .driver import run_suite, CSV_HEADER  # noqa: F401
