"""Profiler smoke test."""

from sleqp_tpu.profile import profile_iteration

from fixtures import hs71_problem, rosenbrock_problem


def test_profile_constrained():
    problem, x0, _ = hs71_problem()
    results = profile_iteration(problem, x0, reps=1)
    assert set(results) >= {
        "func_eval(all)",
        "cauchy_lp",
        "kkt_factorization",
        "kkt_substitution",
        "working_step",
        "eqp_solve",
        "full_iteration",
    }
    assert all(v >= 0.0 for v in results.values())


def test_profile_unconstrained():
    problem, x0, _ = rosenbrock_problem()
    results = profile_iteration(problem, x0, reps=1)
    assert "cauchy_lp" not in results
    assert results["full_iteration"] > 0.0
