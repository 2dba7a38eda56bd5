"""Conformance battery, run in FOUR configurations like the reference's
MOI.Test setup — {HSD, MPC} × {presolve on, presolve off}
(reference: test/Interfaces/MOI_wrapper.jl:24-92) — plus the behaviors
the round-2 review flagged missing: PRIMAL_DUAL_INFEASIBLE,
RelativeGap/ResultCount, objective-sense modification after solve, and
duplicate-name handling. A further dtype axis (f32 at loose tolerance)
covers the arithmetic dimension where tolerances permit.
"""

import numpy as np
import pytest

import tulip_tpu as tlp
from tulip_tpu.problem import INF
from tulip_tpu.status import SolutionStatus, TerminationStatus

CONFIGS = [("HSD", 1), ("HSD", 0), ("MPC", 1), ("MPC", 0)]
CIDS = [f"{a}-ps{p}" for a, p in CONFIGS]

x4 = pytest.mark.parametrize("algo,presolve", CONFIGS, ids=CIDS)


def _model(algo, presolve, **ipm):
    m = tlp.Model()
    m.params.IPM.Algorithm = algo
    m.params.Presolve.Level = presolve
    for k, v in ipm.items():
        setattr(m.params.IPM, k, v)
    return m


def _opt_lp(m):
    """min x+y s.t. x+y>=1, x-y=0.25, 0<=x,y<=1 → x*=0.625, y*=0.375."""
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 0.0, 1.0, "x")
    pb.add_variable((), (), 1.0, 0.0, 1.0, "y")
    pb.add_constraint([0, 1], [1.0, 1.0], 1.0, INF, "c1")
    pb.add_constraint([0, 1], [1.0, -1.0], 0.25, 0.25, "c2")
    return m


# ---------------------------------------------------------------------------
# Core solve behaviors × 4 configs
# ---------------------------------------------------------------------------

@x4
def test_optimal_primal_values(algo, presolve):
    m = _opt_lp(_model(algo, presolve))
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert np.isclose(tlp.get_attribute(m, "ObjectiveValue"), 1.0,
                      atol=1e-7)
    np.testing.assert_allclose(m.solution.x, [0.625, 0.375], atol=1e-6)
    np.testing.assert_allclose(m.solution.Ax, [1.0, 0.25], atol=1e-6)


@x4
def test_optimal_duals_and_gap(algo, presolve):
    m = _opt_lp(_model(algo, presolve))
    m.optimize()
    y = m.solution.y_lower - m.solution.y_upper
    # Active >= row has y1 = 1 (both costs 1, symmetric); equality row 0.
    assert abs(y[0] - 1.0) < 1e-5
    assert abs(y[1]) < 1e-5
    zd = tlp.get_attribute(m, "DualObjectiveValue")
    assert abs(zd - 1.0) < 1e-6
    assert tlp.get_attribute(m, "RelativeGap") < 1e-6
    assert tlp.get_attribute(m, "ResultCount") == 1
    assert tlp.get_attribute(m, "BarrierIterations") > 0
    assert tlp.get_attribute(m, "SimplexIterations") == 0
    assert tlp.get_attribute(m, "RawStatusString") == "OPTIMAL"


@x4
def test_max_sense_with_constant(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.objsense = False
    pb.obj0 = 2.5
    pb.add_variable((), (), 3.0, 0.0, 2.0, "x")
    pb.add_constraint([0], [1.0], -INF, 1.5, "c")
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert np.isclose(tlp.get_attribute(m, "ObjectiveValue"), 3 * 1.5 + 2.5,
                      atol=1e-6)


@x4
def test_primal_infeasible_farkas(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 0.0, 1.0, "x")
    pb.add_variable((), (), 1.0, 0.0, 1.0, "y")
    pb.add_constraint([0, 1], [1.0, 1.0], 3.0, INF, "c")  # x+y>=3 impossible
    st = m.optimize()
    assert st == TerminationStatus.PRIMAL_INFEASIBLE
    sol = m.solution
    assert sol.is_dual_ray
    assert sol.dual_status == SolutionStatus.INFEASIBILITY_CERTIFICATE
    # Farkas positivity (ray-aware DualObjectiveValue, matching the
    # reference's original-space recomputation,
    # reference: tulip_julia_api.jl:243-304).
    assert tlp.get_attribute(m, "DualObjectiveValue") > 1e-8


@x4
def test_dual_infeasible_ray(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), -1.0, 0.0, INF, "x")   # min -x, x unbounded
    pb.add_variable((), (), 1.0, 0.0, 1.0, "y")
    pb.add_constraint([1], [1.0], 0.0, 1.0, "c")
    st = m.optimize()
    assert st == TerminationStatus.DUAL_INFEASIBLE
    sol = m.solution
    assert sol.is_primal_ray
    d = sol.x
    assert d[0] > 1e-8  # improving direction on x
    # Ray-aware objective: c'd < 0 along the improving ray.
    assert tlp.get_attribute(m, "ObjectiveValue") < -1e-8


@x4
def test_free_variable_lp(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), 1.0, -INF, INF, "f")
    pb.add_variable((), (), 0.0, 0.0, 2.0, "x")
    pb.add_constraint([0, 1], [1.0, 1.0], 1.0, 1.0, "c")
    assert m.optimize() == TerminationStatus.OPTIMAL
    # f = 1 - x, min f → x at upper bound 2, f = -1.
    assert np.isclose(m.solution.x[0], -1.0, atol=1e-6)


@x4
def test_fixed_variable_reduced_cost(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), 2.0, 0.7, 0.7, "fix")
    pb.add_variable((), (), 1.0, 0.0, 1.0, "x")
    pb.add_constraint([0, 1], [1.0, 1.0], 1.0, INF, "c")
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert np.isclose(m.solution.x[0], 0.7, atol=1e-7)
    assert np.isclose(tlp.get_attribute(m, "ObjectiveValue"),
                      2.0 * 0.7 + 0.3, atol=1e-6)
    # Reduced cost of the fixed variable: s = c - a'y = 2 - y1.
    s = m.solution.s_lower[0] - m.solution.s_upper[0]
    y = m.solution.y_lower[0] - m.solution.y_upper[0]
    assert abs(s - (2.0 - y)) < 1e-5


@x4
def test_feasibility_problem_zero_objective(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), 0.0, 0.0, 2.0, "x")
    pb.add_variable((), (), 0.0, 0.0, 2.0, "y")
    pb.add_constraint([0, 1], [1.0, 1.0], 1.0, 1.0, "c")
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert abs(tlp.get_attribute(m, "ObjectiveValue")) < 1e-7
    assert abs(sum(m.solution.x) - 1.0) < 1e-6


@x4
def test_ranged_constraint_duals(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 0.0, 5.0, "x")
    pb.add_constraint([0], [2.0], 1.0, 4.0, "r")  # 1 <= 2x <= 4
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert np.isclose(m.solution.x[0], 0.5, atol=1e-6)
    y = m.solution.y_lower[0] - m.solution.y_upper[0]
    assert abs(y - 0.5) < 1e-5          # active at lower: y = c/a = 1/2
    assert m.solution.y_upper[0] < 1e-6  # upper side inactive


@x4
def test_resolve_after_bound_change(algo, presolve):
    m = _opt_lp(_model(algo, presolve))
    assert m.optimize() == TerminationStatus.OPTIMAL
    z1 = tlp.get_attribute(m, "ObjectiveValue")
    tlp.set_attribute(m, "VariableUpperBound", 0.8, index=0)  # x <= 0.8
    assert m.optimize() == TerminationStatus.OPTIMAL
    z2 = tlp.get_attribute(m, "ObjectiveValue")
    assert abs(z1 - 1.0) < 1e-6 and abs(z2 - 1.0) < 1e-6  # still feasible
    tlp.set_attribute(m, "ConstraintLowerBound", 1.2, index=0)  # x+y >= 1.2
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 1.2) < 1e-6


@x4
def test_modify_objective_sense_after_solve(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 0.0, 3.0, "x")
    pb.add_constraint([0], [1.0], 0.5, 2.5, "c")
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert np.isclose(tlp.get_attribute(m, "ObjectiveValue"), 0.5,
                      atol=1e-6)
    tlp.set_attribute(m, "ObjectiveSense", "max")
    assert tlp.get_attribute(m, "ObjectiveSense") == "max"
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert np.isclose(tlp.get_attribute(m, "ObjectiveValue"), 2.5,
                      atol=1e-6)


@x4
def test_delete_then_resolve(algo, presolve):
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 0.0, 1.0, "x")
    pb.add_variable((), (), 5.0, 0.2, 1.0, "expensive")
    pb.add_constraint([0, 1], [1.0, 1.0], 0.5, INF, "c1")
    pb.add_constraint([1], [1.0], 0.2, INF, "c2")
    assert m.optimize() == TerminationStatus.OPTIMAL
    z1 = tlp.get_attribute(m, "ObjectiveValue")
    assert abs(z1 - (0.3 + 1.0)) < 1e-6   # x=0.3, e=0.2
    pb.delete_constraint(1)
    assert m.optimize() == TerminationStatus.OPTIMAL
    pb.delete_variable(1)
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 0.5) < 1e-6


@x4
def test_duplicate_names_allowed(algo, presolve):
    """Names are labels, not keys: duplicates must not break solving or
    attribute queries by index."""
    m = _model(algo, presolve)
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 0.0, 1.0, "same")
    pb.add_variable((), (), 2.0, 0.0, 1.0, "same")
    pb.add_constraint([0], [1.0], 0.25, INF, "con")
    pb.add_constraint([1], [1.0], 0.25, INF, "con")
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert tlp.get_attribute(m, "VariableName", index=0) == "same"
    assert tlp.get_attribute(m, "VariableName", index=1) == "same"
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 0.75) < 1e-6


@x4
def test_empty_problem(algo, presolve):
    m = _model(algo, presolve)
    st = m.optimize()
    assert st == TerminationStatus.OPTIMAL
    assert tlp.get_attribute(m, "ObjectiveValue") == 0.0


@x4
def test_result_count_zero_before_solve(algo, presolve):
    m = _opt_lp(_model(algo, presolve))
    assert tlp.get_attribute(m, "ResultCount") == 0
    assert tlp.get_attribute(m, "RawStatusString") == "NOT_CALLED"
    m.optimize()
    assert tlp.get_attribute(m, "ResultCount") == 1


# ---------------------------------------------------------------------------
# f32 arithmetic axis (loose tolerances), both algorithms
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("algo", ["HSD", "MPC"])
def test_f32_loose_tolerance(algo):
    m = _model(algo, 1, TolerancePFeas=1e-4, ToleranceDFeas=1e-4,
               ToleranceRGap=1e-4, ToleranceIFeas=1e-4,
               PRegMin=1e-6, DRegMin=1e-6)
    m.params.ArithmeticDtype = "float32"
    _opt_lp(m)
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# PRIMAL_DUAL_INFEASIBLE (beyond reference: Trm_PrimalDualInfeasible is
# defined at reference src/status.jl:22 but never produced there)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("algo", ["HSD", "MPC"])
def test_primal_dual_infeasible(algo):
    m = _model(algo, 1)
    pb = m.pbdata
    # Bound conflict on x → primal infeasible; improving unconstrained
    # ray on f → dual infeasible.
    pb.add_variable((), (), 1.0, 2.0, 1.0, "x")       # l > u
    pb.add_variable((), (), -1.0, 0.0, INF, "f")      # min -f, f free up
    pb.add_constraint([1], [1.0], 0.0, INF, "c")      # f >= 0 only
    st = m.optimize()
    assert st == TerminationStatus.PRIMAL_DUAL_INFEASIBLE
    assert tlp.get_attribute(m, "RawStatusString") == "PRIMAL_DUAL_INFEASIBLE"


def test_primal_dual_infeasible_requires_witness():
    """Plain primal infeasibility (no improving ray) must NOT be
    upgraded."""
    m = _model("HSD", 1)
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 2.0, 1.0, "x")       # l > u
    pb.add_variable((), (), 1.0, 0.0, 1.0, "y")       # bounded, cost >= 0
    pb.add_constraint([1], [1.0], 0.0, 1.0, "c")
    assert m.optimize() == TerminationStatus.PRIMAL_INFEASIBLE
