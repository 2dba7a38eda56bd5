"""Conformance battery part 3 (round 2): more MOI.Test-style behaviors.

Covers name attributes, presolve on/off and engine equivalence, scaling
invariance, box-only problems, duality-gap reporting, linprog interface
shapes, and edge statuses (complements tests/test_conformance{,_more}.py;
reference: test/Interfaces/MOI_wrapper.jl:11-92 MOI.Test coverage role).
"""

import numpy as np
import pytest

import tulip_tpu as tlp
from tulip_tpu.problem import INF
from tulip_tpu.status import SolutionStatus, TerminationStatus

from x4 import make_x4_fixture

# Run every behavior in this module under the reference's four MOI.Test
# configurations {HSD, MPC} x {presolve on/off}
# (reference: test/Interfaces/MOI_wrapper.jl:24-92).
_x4_config = make_x4_fixture(slim=True)

OPT = TerminationStatus.OPTIMAL


def new_model(**kw):
    m = tlp.Model()
    for k, v in kw.items():
        tlp.set_parameter(m, k, v)
    return m


def simple_lp(m):
    """min -x1 - 2 x2 s.t. x1 + x2 <= 1, 0 <= x <= 1. Optimum -2 at (0,1)?
    No: x1+x2<=1 so best is x2=1, x1=0 -> -2."""
    x1 = m.pbdata.add_variable((), (), -1.0, 0.0, 1.0, "x1")
    x2 = m.pbdata.add_variable((), (), -2.0, 0.0, 1.0, "x2")
    m.pbdata.add_constraint([x1, x2], [1.0, 1.0], -INF, 1.0, "c1")
    return x1, x2


# ---------------------------------------------------------------------------
# Names and attributes
# ---------------------------------------------------------------------------

def test_variable_and_constraint_names_roundtrip():
    m = new_model()
    x1, x2 = simple_lp(m)
    assert tlp.get_attribute(m, "VariableName", x1) == "x1"
    assert tlp.get_attribute(m, "ConstraintName", 0) == "c1"
    tlp.set_attribute(m, "VariableName", "renamed", index=x2)
    assert tlp.get_attribute(m, "VariableName", x2) == "renamed"
    tlp.set_attribute(m, "ConstraintName", "row0", index=0)
    assert tlp.get_attribute(m, "ConstraintName", 0) == "row0"


def test_model_name_attribute():
    m = new_model()
    tlp.set_attribute(m, "ModelName", "my-model")
    assert tlp.get_attribute(m, "ModelName") == "my-model"


def test_objective_constant_attribute_roundtrip():
    m = new_model()
    simple_lp(m)
    tlp.set_attribute(m, "ObjectiveConstant", 5.0)
    assert tlp.get_attribute(m, "ObjectiveConstant") == 5.0
    assert m.optimize() == OPT
    assert tlp.get_attribute(m, "ObjectiveValue") == pytest.approx(3.0, abs=1e-7)


def test_barrier_iterations_and_solve_time_reported():
    m = new_model()
    simple_lp(m)
    assert m.optimize() == OPT
    assert tlp.get_attribute(m, "BarrierIterations") > 0
    assert tlp.get_attribute(m, "SolutionTime") > 0.0


def test_variable_objective_coeff_modify():
    m = new_model()
    x1, x2 = simple_lp(m)
    assert m.optimize() == OPT
    tlp.set_attribute(m, "VariableObjectiveCoeff", -10.0, index=x1)
    assert tlp.get_attribute(m, "VariableObjectiveCoeff", x1) == -10.0
    assert m.optimize() == OPT
    # Now x1 = 1 is the best use of the row budget.
    assert m.solution.x[x1] == pytest.approx(1.0, abs=1e-6)
    assert tlp.get_attribute(m, "ObjectiveValue") == pytest.approx(-10.0,
                                                                   abs=1e-6)


# ---------------------------------------------------------------------------
# Presolve equivalences
# ---------------------------------------------------------------------------

def _rand_lp_model(seed, **kw):
    rng = np.random.default_rng(seed)
    mm, nn = 8, 16
    A = rng.standard_normal((mm, nn))
    u = rng.uniform(1, 3, nn)
    b = A @ (u * rng.uniform(0.2, 0.8, nn))
    c = rng.standard_normal(nn)
    m = new_model(**kw)
    for j in range(nn):
        m.pbdata.add_variable((), (), float(c[j]), 0.0, float(u[j]))
    for i in range(mm):
        m.pbdata.add_constraint(list(range(nn)), [float(v) for v in A[i]],
                                float(b[i]), float(b[i]))
    return m


def test_presolve_on_off_same_objective():
    zs = []
    for level in (0, 1):
        m = _rand_lp_model(3, Presolve_Level=level)
        assert m.optimize() == OPT
        zs.append(tlp.get_attribute(m, "ObjectiveValue"))
    assert zs[0] == pytest.approx(zs[1], rel=1e-7)


def test_presolve_engine_python_native_same_solution():
    from tulip_tpu.presolve.native import native_available
    if not native_available():
        pytest.skip("native presolve unavailable")
    sols = []
    for eng in ("python", "native"):
        m = _rand_lp_model(4, Presolve_Engine=eng)
        assert m.optimize() == OPT
        sols.append(np.asarray(m.solution.x))
    np.testing.assert_allclose(sols[0], sols[1], atol=1e-9)


def test_row_scaling_invariance():
    """Multiplying a row and its bounds by 1e6 must not change the
    solution (2-norm equilibration absorbs it)."""
    xs = []
    for scale in (1.0, 1e6):
        m = new_model()
        x1 = m.pbdata.add_variable((), (), 1.0, 0.0, INF)
        x2 = m.pbdata.add_variable((), (), 2.0, 0.0, INF)
        m.pbdata.add_constraint([x1, x2], [scale, scale], scale, INF)
        assert m.optimize() == OPT
        xs.append(np.asarray(m.solution.x))
    np.testing.assert_allclose(xs[0], xs[1], atol=1e-7)


def test_bound_inconsistency_certified_by_presolve():
    m = new_model()
    m.pbdata.add_variable((), (), 1.0, 2.0, 1.0)  # l > u
    st = m.optimize()
    assert st == TerminationStatus.PRIMAL_INFEASIBLE
    assert m.solution.dual_status == SolutionStatus.INFEASIBILITY_CERTIFICATE


# ---------------------------------------------------------------------------
# Structure edge cases
# ---------------------------------------------------------------------------

def test_box_only_problem():
    """No constraints at all: min over the box fixes each var by cost sign."""
    m = new_model()
    m.pbdata.add_variable((), (), 1.0, -1.0, 2.0)
    m.pbdata.add_variable((), (), -1.0, -1.0, 2.0)
    m.pbdata.add_variable((), (), 0.0, -1.0, 2.0)
    assert m.optimize() == OPT
    assert tlp.get_attribute(m, "ObjectiveValue") == pytest.approx(-3.0,
                                                                   abs=1e-7)
    assert m.solution.x[0] == pytest.approx(-1.0, abs=1e-7)
    assert m.solution.x[1] == pytest.approx(2.0, abs=1e-7)


def test_equal_range_bounds_is_equality():
    """A range row with l == u behaves exactly like an equality row."""
    m = new_model()
    x = m.pbdata.add_variable((), (), 1.0, 0.0, INF)
    m.pbdata.add_constraint([x], [2.0], 3.0, 3.0)
    assert m.optimize() == OPT
    assert m.solution.x[x] == pytest.approx(1.5, abs=1e-7)
    y = m.solution.y_lower[0] - m.solution.y_upper[0]
    assert y == pytest.approx(0.5, abs=1e-6)  # s = c - a y = 0


def test_duality_gap_reported_closed():
    m = _rand_lp_model(5)
    assert m.optimize() == OPT
    z = tlp.get_attribute(m, "ObjectiveValue")
    zd = tlp.get_attribute(m, "DualObjectiveValue")
    assert zd == pytest.approx(z, rel=1e-6)
    assert z >= zd - 1e-6 * max(1.0, abs(z))  # weak duality (min sense)


def test_reduced_costs_complement_bounds():
    """s = c - A'y, s_lower > 0 only at lower bound, s_upper > 0 only at
    upper bound."""
    m = _rand_lp_model(6)
    assert m.optimize() == OPT
    sol = m.solution
    pb = m.pbdata
    A = pb.to_dense()
    y = np.asarray(sol.y_lower) - np.asarray(sol.y_upper)
    s = np.asarray(pb.obj) - A.T @ y
    s_got = np.asarray(sol.s_lower) - np.asarray(sol.s_upper)
    np.testing.assert_allclose(s_got, s, atol=1e-6)


def test_free_row_is_never_binding():
    m = new_model()
    x = m.pbdata.add_variable((), (), 1.0, 1.0, 5.0)
    m.pbdata.add_constraint([x], [1.0], -INF, INF)  # free row
    assert m.optimize() == OPT
    assert m.solution.x[x] == pytest.approx(1.0, abs=1e-7)
    assert abs(m.solution.y_lower[0] - m.solution.y_upper[0]) < 1e-7


def test_tiny_time_limit_still_terminates():
    m = _rand_lp_model(7)
    tlp.set_parameter(m, "IPM_TimeLimit", 1e-9)
    st = m.optimize()
    assert st in (TerminationStatus.TIME_LIMIT, OPT)


def test_mpc_on_infeasible_problem_terminates():
    """MPC has weaker certificates than HSD (reference: MPC.jl:185-208) but
    must still terminate on an infeasible instance without claiming
    optimality."""
    m = new_model(IPM_Algorithm="MPC", Presolve_Level=0)
    x = m.pbdata.add_variable((), (), 1.0, 0.0, 1.0)
    m.pbdata.add_constraint([x], [1.0], 2.0, 3.0)  # x >= 2 vs x <= 1
    st = m.optimize()
    assert st != OPT


# ---------------------------------------------------------------------------
# linprog interface shapes
# ---------------------------------------------------------------------------

def test_linprog_a_ub_only():
    from tulip_tpu.linprog import linprog
    r = linprog([-1.0, -1.0], A_ub=[[1.0, 2.0]], b_ub=[2.0],
                bounds=[(0, None), (0, None)])
    assert r.success
    assert r.fun == pytest.approx(-2.0, abs=1e-6)


def test_linprog_a_eq_and_ub():
    from tulip_tpu.linprog import linprog
    r = linprog([1.0, 1.0, 0.0],
                A_eq=[[1.0, 1.0, 1.0]], b_eq=[1.0],
                A_ub=[[1.0, -1.0, 0.0]], b_ub=[0.2],
                bounds=[(0, None)] * 3)
    assert r.success
    assert r.fun == pytest.approx(0.0, abs=1e-6)


def test_linprog_default_bounds_are_nonneg():
    from tulip_tpu.linprog import linprog
    r = linprog([1.0], A_eq=[[1.0]], b_eq=[3.0])
    assert r.success
    assert r.x[0] == pytest.approx(3.0, abs=1e-6)


def test_linprog_infeasible_status_code():
    from tulip_tpu.linprog import linprog
    r = linprog([1.0], A_eq=[[1.0]], b_eq=[-1.0])  # x >= 0 but x = -1
    assert not r.success
    assert r.status == 2  # scipy convention: infeasible
