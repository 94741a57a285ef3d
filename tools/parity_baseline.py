"""Independent-solver parity baseline over the 59-problem HS suite.

The reference C library cannot be built in this environment (its hard
dependencies — trlib and an LP backend out of SoPlex/HiGHS/Gurobi — ship
no sources here and the sandbox has no network), so the committed parity
comparison uses scipy's SLSQP (the classic Kraft SQP implementation) on
the *same* problem set at the same tolerances as the stand-in for an
established solver baseline (reference success-rate target:
BASELINE.md >= 0.95x).

Success = SLSQP reports convergence AND max constraint/bound violation
<= 1e-6 AND the objective matches the published HS optimum to 1e-4
relative (identical to harness/driver.py's solved+obj_ok accounting).

Emits the reference CSV schema (sleqp_cutest_driver.c:104-121 fields
that apply) to artifacts/suite_slsqp_r3.csv and prints the ratio.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from scipy.optimize import minimize as scipy_minimize

    from sleqp_tpu.harness.hs import HS_PROBLEMS
    from sleqp_tpu.harness.medium import MEDIUM_PROBLEMS
    from sleqp_tpu.harness.driver import get_problem

    # HS + medium: everything SLSQP (dense, n <= ~1000) can reasonably
    # attempt; the large banded tier (n >= 10^4) is out of reach for a
    # dense SQP and is excluded from the baseline.
    import sys as _sys

    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    PROBLEM_NAMES = {
        "hs": list(HS_PROBLEMS),
        "medium": list(MEDIUM_PROBLEMS),
        "all": list(HS_PROBLEMS) + list(MEDIUM_PROBLEMS),
    }[which]

    rows = []
    solved_count = 0
    for name in PROBLEM_NAMES:
        problem, x0, f_opt = get_problem(name)
        n = problem.num_variables
        m = problem.num_cons

        obj = jax.jit(problem.obj_val)
        grad = jax.jit(jax.grad(problem.obj_val))

        def np_obj(x, _o=obj):
            return float(_o(jnp.asarray(x)))

        def np_grad(x, _g=grad):
            return np.asarray(_g(jnp.asarray(x)))

        lb = np.asarray(problem.data.var_lb)
        ub = np.asarray(problem.data.var_ub)
        bounds = [
            (
                None if not np.isfinite(lo) else lo,
                None if not np.isfinite(hi) else hi,
            )
            for lo, hi in zip(lb, ub)
        ]

        constraints = []
        if m:
            cons_fn = jax.jit(
                lambda x, _p=problem: _p.eval_all(x)[2]
            )
            cons_jac_fn = jax.jit(
                lambda x, _p=problem: _p.eval_all(x)[3]
            )
            clb = np.asarray(problem.data.cons_lb)
            cub = np.asarray(problem.data.cons_ub)

            def np_cons(x, _c=cons_fn):
                return np.asarray(_c(jnp.asarray(x)))

            def np_jac(x, _j=cons_jac_fn):
                return np.asarray(_j(jnp.asarray(x)))

            for i in range(m):
                if clb[i] == cub[i]:
                    constraints.append(
                        {
                            "type": "eq",
                            "fun": (lambda x, i=i: np_cons(x)[i] - clb[i]),
                            "jac": (lambda x, i=i: np_jac(x)[i]),
                        }
                    )
                    continue
                if np.isfinite(clb[i]):
                    constraints.append(
                        {
                            "type": "ineq",
                            "fun": (lambda x, i=i: np_cons(x)[i] - clb[i]),
                            "jac": (lambda x, i=i: np_jac(x)[i]),
                        }
                    )
                if np.isfinite(cub[i]):
                    constraints.append(
                        {
                            "type": "ineq",
                            "fun": (lambda x, i=i: cub[i] - np_cons(x)[i]),
                            "jac": (lambda x, i=i: -np_jac(x)[i]),
                        }
                    )

        t0 = time.perf_counter()
        try:
            res = scipy_minimize(
                np_obj,
                np.asarray(x0),
                jac=np_grad,
                bounds=bounds,
                constraints=constraints,
                method="SLSQP",
                options={"maxiter": 500, "ftol": 1e-10},
            )
            ok = bool(res.success)
            x = np.asarray(res.x)
            fval = float(res.fun)
            nit = int(res.nit)
        except Exception as exc:  # noqa: BLE001
            ok, x, fval, nit = False, np.asarray(x0), float("nan"), 0
            print(f"# {name}: SLSQP raised {exc}", file=sys.stderr)
        seconds = time.perf_counter() - t0

        # feasibility at the returned point
        viol = 0.0
        viol = max(viol, float(np.max(np.where(np.isfinite(lb), lb - x, 0.0), initial=0.0)))
        viol = max(viol, float(np.max(np.where(np.isfinite(ub), x - ub, 0.0), initial=0.0)))
        if m:
            c = np_cons(x)
            viol = max(viol, float(np.max(np.where(np.isfinite(clb), clb - c, 0.0), initial=0.0)))
            viol = max(viol, float(np.max(np.where(np.isfinite(cub), c - cub, 0.0), initial=0.0)))

        solved = ok and viol <= 1e-6
        if solved and f_opt is not None:
            solved = abs(fval - f_opt) <= 1e-4 * (1.0 + abs(f_opt))
        solved_count += int(solved)

        rows.append(
            ";".join(
                [
                    name,
                    str(n),
                    str(m),
                    "optimal" if solved else ("feasible" if ok else "failed"),
                    f"{fval:.10e}",
                    f"{viol:.6e}",
                    "-",
                    "-",
                    str(nit),
                    f"{seconds:.3f}",
                ]
            )
        )
        print(rows[-1])

    total = len(PROBLEM_NAMES)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "suite_slsqp_r5.csv",
    )
    with open(out, "w") as fh:
        fh.write(
            "name;nvars;ncons;status;obj;feas_res;slack_res;stat_res;"
            "iterations;seconds\n"
        )
        fh.write("\n".join(rows) + "\n")
        fh.write(
            f"# solved {solved_count}/{total} "
            f"({100.0 * solved_count / total:.1f}%)\n"
        )
    print(f"# SLSQP solved {solved_count}/{total}")


if __name__ == "__main__":
    main()
