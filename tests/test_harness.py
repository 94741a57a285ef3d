"""Harness smoke tests (full 39-problem sweep runs in CI/bench, not here)."""

import numpy as np
import pytest

from sleqp_tpu.deriv_check import InvalidDerivativeError, check_derivatives
from sleqp_tpu.harness import CSV_HEADER, run_suite
from sleqp_tpu.harness.hs import HS_PROBLEMS, get_problem

from fixtures import hs71_problem

SUBSET = ["hs4", "hs9", "hs14", "hs35", "hs43", "hs71"]


def test_registry_complete():
    assert len(HS_PROBLEMS) >= 39
    for name in HS_PROBLEMS:
        problem, x0, f_opt = get_problem(name)
        assert problem.num_variables == x0.shape[0]


def test_suite_subset_all_solved():
    result = run_suite(SUBSET, max_iterations=300)
    assert result.solved == len(SUBSET), result.rows
    assert not result.wrong_objective
    # CSV schema matches the reference field count
    assert len(CSV_HEADER.split(";")) == 14
    for row in result.rows:
        assert len(row.split(";")) == 14


def test_deriv_check_passes_on_ad():
    problem, x0, _ = hs71_problem()
    findings = check_derivatives(problem, x0)
    assert findings == []


def test_deriv_check_catches_wrong_gradient():
    import jax.numpy as jnp

    from sleqp_tpu import Func, Problem

    func = Func(
        lambda x: jnp.vdot(x, x),
        num_variables=2,
        obj_grad=lambda x: 3.0 * x,  # wrong: should be 2x
    )
    problem = Problem(func)
    with pytest.raises(InvalidDerivativeError):
        check_derivatives(problem, jnp.array([1.0, 2.0]))


@pytest.mark.parametrize(
    "name", ["extrosnb100", "dqrtic100", "broydn100", "chainqp200"]
)
def test_medium_problem_solves(name):
    """Medium-scale suite problems (n ~ 100-200) solve to the published
    optimum through the same driver accounting as the HS sweep."""
    from sleqp_tpu.harness.driver import run_problem

    row, solved, obj_ok = run_problem(name, max_iterations=500)
    assert solved, row
    assert obj_ok, row


def test_medium_registry_complete():
    from sleqp_tpu.harness.driver import ALL_PROBLEMS
    from sleqp_tpu.harness.large import LARGE_PROBLEMS
    from sleqp_tpu.harness.medium import MEDIUM_PROBLEMS

    assert len(MEDIUM_PROBLEMS) == 17
    assert len(LARGE_PROBLEMS) == 3
    assert set(MEDIUM_PROBLEMS) <= set(ALL_PROBLEMS)
    assert set(LARGE_PROBLEMS) <= set(ALL_PROBLEMS)
    assert len(ALL_PROBLEMS) == 81 + 17 + 3


def test_banded_slack_res_is_measured():
    """The banded suite row reports a measured complementarity residual
    (not a hardcoded 0.0) that is small at an optimal point (ADVICE r4)."""
    import jax.numpy as jnp

    from sleqp_tpu import Settings, Status
    from sleqp_tpu.banded import BandedProblem, banded_solve
    from sleqp_tpu.harness.driver import _banded_slack_res

    N_b, k = 6, 2
    tgt = jnp.arange(N_b, dtype=jnp.float64)

    def obj(x, t):
        return jnp.sum((x - tgt[t]) ** 2)

    def cons(a, b, t):
        return b - a

    p = BandedProblem(
        obj, N_b, k, cons_block=cons, cons_per_block=k,
        var_lb=0.0, var_ub=3.0, cons_lb=-0.5, cons_ub=0.5,
    )
    st = banded_solve(p, Settings(), max_iterations=100)
    assert int(st.status) == Status.OPTIMAL
    slack = _banded_slack_res(p, st)
    assert np.isfinite(slack)
    assert slack <= 1e-6


def test_banded_time_limit_rejected():
    """time_limit has no host checkpoint on the jitted banded path; the
    driver must reject it explicitly instead of silently ignoring it."""
    import pytest

    from sleqp_tpu.harness.driver import run_problem
    from sleqp_tpu.harness.large import LARGE_PROBLEMS

    with pytest.raises(ValueError, match="time_limit"):
        run_problem(LARGE_PROBLEMS[0], time_limit=10.0)
