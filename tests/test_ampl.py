"""AMPL .nl front end (harness/ampl.py): text g-format reader + .sol.

The reference's AMPL binding (bindings/ampl/ampl_main.c) evaluates
through ASL; here the expression graphs become JAX functions and
derivatives come from AD.  Fixtures are hand-authored in the documented
text encoding (D. Gay, "Writing .nl Files").
"""

import numpy as np
import pytest

from sleqp_tpu.harness.ampl import NLFormatError, read_nl, solve_nl, write_sol

# HS71 in text .nl: min x0*x3*(x0+x1+x2) + x2
#  s.t. x0*x1*x2*x3 >= 25, sum(x^2) == 40, 1 <= x <= 5
HS71_NL = """g3 0 1 0\t# hs71
 4 2 1 0 1
 2 1
 0 0
 4 4 4
 0 0 0 1
 0 0 0 0 0
 8 4
 0 0
 0 0 0 0 0
C0
o2
v0
o2
v1
o2
v2
v3
C1
o54
4
o77
v0
o77
v1
o77
v2
o77
v3
O0 0
o0
o2
v0
o2
v3
o54
3
v0
v1
v2
v2
x4
0 1
1 5
2 5
3 1
r
2 25
4 40
b
0 1 5
0 1 5
0 1 5
0 1 5
"""

# max 3x + 4y s.t. x + 2y <= 14, 3x - y >= 0, x - y <= 2 (pure LP,
# maximization sense; optimum (6, 4), objective 34)
LP_NL = """g3 0 1 0\t# lp
 2 3 1 0 0
 0 0
 0 0
 0 0 0
 0 0 0 1
 0 0 0 0 0
 6 2
 0 0
 0 0 0 0 0
r
1 14
2 0
1 2
b
3
3
J0 2
0 1
1 2
J1 2
0 3
1 -1
J2 2
0 1
1 -1
O0 1
n0
G0 2
0 3
1 4
"""


def test_read_nl_hs71():
    import jax.numpy as jnp

    problem, x0, sense = read_nl(HS71_NL)
    assert problem.num_variables == 4
    assert problem.num_cons == 2
    assert sense == 1.0
    np.testing.assert_allclose(np.asarray(x0), [1.0, 5.0, 5.0, 1.0])
    x = jnp.asarray([1.0, 5.0, 5.0, 1.0])
    assert float(problem.obj_val(x)) == pytest.approx(16.0)
    np.testing.assert_allclose(
        np.asarray(problem.cons_val(x)), [25.0, 52.0]
    )
    np.testing.assert_allclose(np.asarray(problem.data.cons_lb), [25.0, 40.0])
    np.testing.assert_allclose(np.asarray(problem.data.cons_ub), [np.inf, 40.0])


def test_solve_nl_hs71(tmp_path):
    nl = tmp_path / "hs71.nl"
    nl.write_text(HS71_NL)
    solver, status, obj_val = solve_nl(str(nl), max_iterations=100)
    assert obj_val == pytest.approx(17.0140173, abs=1e-4)
    sol = (tmp_path / "hs71.sol").read_text()
    assert "OPTIMAL" in sol
    # x values present at full precision
    assert "objno 0 0" in sol


def test_solve_nl_lp_maximize(tmp_path):
    nl = tmp_path / "lp.nl"
    nl.write_text(LP_NL)
    solver, status, obj_val = solve_nl(str(nl), max_iterations=100)
    # maximization: reported objective is in the ORIGINAL sense
    assert obj_val == pytest.approx(34.0, abs=1e-6)
    np.testing.assert_allclose(solver.solution, [6.0, 4.0], atol=1e-6)


def test_unsupported_features_rejected():
    with pytest.raises(NLFormatError, match="text"):
        read_nl("b3 0 1 0\n 1 0 1 0 0\n")
    bad = HS71_NL.replace("C0\no2", "C0\no99")
    with pytest.raises(NLFormatError, match="opcode"):
        p, x0, _ = read_nl(bad)
        p.cons_val(x0)


def test_write_sol_roundtrip(tmp_path):
    path = tmp_path / "out.sol"
    write_sol(str(path), "test message", [1.0, 2.5], [0.5], solve_result=0)
    text = path.read_text()
    assert "test message" in text
    assert "2.5" in text
