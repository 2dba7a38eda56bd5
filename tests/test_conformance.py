"""Solver-conformance battery.

Plays the role of the reference's MOI.Test.runtests coverage
(reference: test/Interfaces/MOI_wrapper.jl:11-92): a battery of small
model-building / solving / querying / modification behaviors every LP
solver must get right — incremental edits followed by re-solve, empty
models, bound conflicts, sense switches, constants, rays.
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
_x4_config = make_x4_fixture()

OPT = TerminationStatus.OPTIMAL


def new_model(**kw):
    m = tlp.Model()
    for k, v in kw.items():
        tlp.set_parameter(m, k, v)
    return m


def test_empty_model():
    m = new_model()
    st = m.optimize()
    assert st == OPT
    assert tlp.get_attribute(m, "ObjectiveValue") == 0.0


def test_objective_constant_only():
    m = new_model()
    m.pbdata.obj0 = 3.5
    assert m.optimize() == OPT
    assert tlp.get_attribute(m, "ObjectiveValue") == 3.5


def test_single_variable_min_max():
    m = new_model()
    m.pbdata.add_variable((), (), 2.0, -1.0, 4.0)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - (-2.0)) < 1e-8
    m.pbdata.objsense = False
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 8.0) < 1e-8


def test_modify_objective_and_resolve():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 1.0)
    y = pb.add_variable((), (), 2.0, 0.0, 1.0)
    pb.add_constraint([x, y], [1.0, 1.0], 1.0, 1.0)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 1.0) < 1e-7
    # Swap costs -> optimum moves to the other vertex.
    tlp.set_attribute(m, "VariableObjectiveCoeff", 3.0, index=x)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 2.0) < 1e-7
    np.testing.assert_allclose(m.solution.x, [0.0, 1.0], atol=1e-6)


def test_modify_bounds_and_resolve():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), -1.0, 0.0, 1.0)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") + 1.0) < 1e-8
    tlp.set_attribute(m, "VariableUpperBound", 5.0, index=x)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") + 5.0) < 1e-8


def test_modify_constraint_bounds_and_resolve():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, INF)
    ci = pb.add_constraint([x], [1.0], 2.0, INF)
    assert m.optimize() == OPT
    # 1e-6 = the reference MOI conformance tolerance
    # (test/Interfaces/MOI_wrapper.jl:18-19); without presolve these solve
    # through the IPM at its sqrt(eps) RELATIVE tolerance.
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 2.0) < 1e-6
    tlp.set_attribute(m, "ConstraintLowerBound", 7.0, index=ci)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 7.0) < 1e-6


def test_delete_variable_and_resolve():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 10.0, "x")
    y = pb.add_variable((), (), 5.0, 0.0, 10.0, "y")
    pb.add_constraint([x, y], [1.0, 1.0], 4.0, INF)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 4.0) < 1e-7
    pb.delete_variable(x)
    assert m.optimize() == OPT
    # Only y remains: 5 * 4 = 20.
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 20.0) < 1e-7


def test_delete_constraint_and_resolve():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 10.0)
    c1 = pb.add_constraint([x], [1.0], 3.0, INF)
    pb.add_constraint([x], [1.0], 1.0, INF)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 3.0) < 1e-6
    pb.delete_constraint(c1)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 1.0) < 1e-6


def test_set_coefficient_and_resolve():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, INF)
    ci = pb.add_constraint([x], [1.0], 6.0, 6.0)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 6.0) < 1e-8
    pb.set_coefficient(ci, x, 2.0)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 3.0) < 1e-8


def test_bound_conflict_infeasible():
    m = new_model()
    m.pbdata.add_variable((), (), 1.0, 3.0, 1.0)  # l > u
    assert m.optimize() == TerminationStatus.PRIMAL_INFEASIBLE


def test_interval_constraint():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), -1.0, 0.0, INF)
    pb.add_constraint([x], [1.0], 2.0, 5.0)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") + 5.0) < 1e-6
    y = m.solution.y_lower[0] - m.solution.y_upper[0]
    assert abs(y - (-1.0)) < 1e-6  # active at upper -> y <= 0


def test_free_constraint_row():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 1.0, INF)
    pb.add_constraint([x], [1.0], -INF, INF)  # free row
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 1.0) < 1e-8


def test_unbounded_ray_query():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), -1.0, 0.0, INF)
    assert m.optimize() == TerminationStatus.DUAL_INFEASIBLE
    assert m.solution.is_primal_ray
    assert m.solution.x[0] > 0
    # Reference convention: ObjectiveValue of a ray is c'ray (no constant)
    # (reference: tulip_julia_api.jl:250-255).
    assert tlp.get_attribute(m, "ObjectiveValue") < 0


def test_infeasible_farkas_query():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 1.0)
    pb.add_constraint([x], [1.0], 5.0, INF)  # x >= 5 with x <= 1
    assert m.optimize() == TerminationStatus.PRIMAL_INFEASIBLE
    assert m.solution.is_dual_ray
    # Primal status is Unknown on infeasible -> ObjectiveValue 0; the dual
    # Farkas value is queryable and positive (certificate inequality).
    assert tlp.get_attribute(m, "ObjectiveValue") == 0.0
    assert tlp.get_attribute(m, "DualObjectiveValue") > 0


def test_max_with_constant():
    m = new_model()
    pb = m.pbdata
    pb.objsense = False
    pb.obj0 = 10.0
    pb.add_variable((), (), 1.0, 0.0, 3.0)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 13.0) < 1e-8
    assert abs(tlp.get_attribute(m, "DualObjectiveValue") - 13.0) < 1e-7


def test_attribute_surface():
    m = new_model()
    pb = m.pbdata
    tlp.set_attribute(m, "ModelName", "conftest-model")
    x = pb.add_variable((), (), 1.5, 0.0, 2.0, "xvar")
    ci = pb.add_constraint([x], [1.0], 0.0, 2.0, "crow")
    assert tlp.get_attribute(m, "ModelName") == "conftest-model"
    assert tlp.get_attribute(m, "NumberOfVariables") == 1
    assert tlp.get_attribute(m, "NumberOfConstraints") == 1
    assert tlp.get_attribute(m, "VariableName", index=x) == "xvar"
    assert tlp.get_attribute(m, "ConstraintName", index=ci) == "crow"
    assert tlp.get_attribute(m, "VariableObjectiveCoeff", index=x) == 1.5
    assert tlp.get_attribute(m, "ObjectiveSense") == "min"
    assert tlp.get_attribute(m, "Status") == TerminationStatus.NOT_CALLED
    m.optimize()
    assert tlp.get_attribute(m, "Status") == OPT
    assert tlp.get_attribute(m, "BarrierIterations") >= 0
    assert tlp.get_attribute(m, "SolutionTime") > 0


def test_parameter_routing_and_errors():
    m = new_model()
    tlp.set_parameter(m, "IPM_IterationsLimit", 5)
    assert tlp.get_parameter(m, "IPM_IterationsLimit") == 5
    tlp.set_parameter(m, "KKT_Backend", "dense")
    assert tlp.get_parameter(m, "KKT_Backend") == "dense"
    tlp.set_parameter(m, "Presolve_Level", 0)
    assert tlp.get_parameter(m, "Presolve_Level") == 0
    tlp.set_parameter(m, "OutputLevel", 0)
    with pytest.raises(KeyError):
        tlp.get_parameter(m, "IPM_NoSuchOption")
    with pytest.raises(KeyError):
        tlp.set_parameter(m, "Bogus", 1)


def test_empty_after_model_reuse():
    m = new_model()
    m.pbdata.add_variable((), (), 1.0, 1.0, 2.0)
    assert m.optimize() == OPT
    m.empty()
    assert m.pbdata.nvar == 0
    assert tlp.get_attribute(m, "Status") == TerminationStatus.NOT_CALLED
    assert m.optimize() == OPT  # empty model solves trivially
    assert tlp.get_attribute(m, "ObjectiveValue") == 0.0


def test_equality_duals_sign_convention():
    """y split into y_lower/y_upper (both >= 0) like the reference
    (reference: src/solution.jl:10-16, model.jl:178-179)."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 2.0, 0.0, INF)
    pb.add_constraint([x], [1.0], 3.0, 3.0)
    assert m.optimize() == OPT
    assert m.solution.y_lower[0] >= 0
    assert m.solution.y_upper[0] >= 0
    y = m.solution.y_lower[0] - m.solution.y_upper[0]
    assert abs(y - 2.0) < 1e-6


def test_fixed_variable_model():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 4.0, 2.5, 2.5)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 10.0) < 1e-8
    assert m.solution.x[0] == 2.5


@pytest.mark.parametrize("algo", ["HSD", "MPC"])
def test_zero_iteration_limit_statuses(algo):
    m = new_model(IPM_Algorithm=algo, IPM_IterationsLimit=0,
                  Presolve_Level=0)
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 1.0)
    pb.add_constraint([x], [1.0], 0.5, 0.5)
    assert m.optimize() == TerminationStatus.ITERATION_LIMIT


def test_profile_dir_emits_trace(tmp_path):
    """ProfileDir wraps the IPM phase in jax.profiler.trace (device-side
    analogue of the reference's TimerOutputs, SURVEY §5)."""
    import os

    import tulip_tpu as tlp

    m = tlp.Model()
    m.pbdata.add_variable((), (), 1.0, 0.0, 2.0)
    m.pbdata.add_constraint([0], [1.0], 1.0, 1.0)
    m.params.ProfileDir = str(tmp_path)
    m.params.Presolve.Level = 0   # ensure the IPM phase actually runs
    st = m.optimize()
    assert int(st) == 2
    traced = []
    for root, _, files in os.walk(tmp_path):
        traced += [f for f in files if f.endswith((".pb", ".json.gz",
                                                   ".trace.json.gz",
                                                   ".xplane.pb"))]
    assert traced, "no profiler artifacts written"


def test_time_limit_status():
    m = new_model(IPM_TimeLimit=0.0, Presolve_Level=0, OutputLevel=0)
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 1.0)
    pb.add_constraint([x], [1.0], 0.5, 0.5)
    assert m.optimize() == TerminationStatus.TIME_LIMIT


def test_duplicate_terms_are_merged():
    """Duplicate column indices in one constraint sum their coefficients
    (MOI's ScalarAffineFunction canonicalization behavior)."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, INF)
    ci = pb.add_constraint([x, x, x], [1.0, 2.0, -0.5], 5.0, 5.0)
    assert pb.get_coefficient(ci, x) == 2.5
    assert m.optimize() == OPT
    assert abs(m.solution.x[0] - 2.0) < 1e-7


def test_feasibility_only_problem():
    """Zero objective: any feasible point is optimal, z = 0."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 0.0, 0.0, INF)
    y = pb.add_variable((), (), 0.0, 0.0, INF)
    pb.add_constraint([x, y], [1.0, 1.0], 2.0, 2.0)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue")) < 1e-9
    assert abs(m.solution.x[0] + m.solution.x[1] - 2.0) < 1e-6


def test_max_sense_unbounded_ray():
    m = new_model()
    pb = m.pbdata
    pb.objsense = False                      # maximize
    pb.add_variable((), (), 1.0, 0.0, INF)   # max x, x >= 0
    assert m.optimize() == TerminationStatus.DUAL_INFEASIBLE
    assert m.solution.is_primal_ray
    assert m.solution.x[0] > 0


def test_objective_sense_attribute_roundtrip():
    m = new_model()
    pb = m.pbdata
    pb.add_variable((), (), 1.0, -2.0, 3.0)
    tlp.set_attribute(m, "ObjectiveSense", "max")
    assert tlp.get_attribute(m, "ObjectiveSense") == "max"
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 3.0) < 1e-8
    tlp.set_attribute(m, "ObjectiveSense", "min")
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") + 2.0) < 1e-8


def test_resolve_is_idempotent():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 2.0)
    pb.add_constraint([x], [1.0], 1.0, 2.0)
    assert m.optimize() == OPT
    z1 = tlp.get_attribute(m, "ObjectiveValue")
    x1 = np.array(m.solution.x)
    assert m.optimize() == OPT
    assert tlp.get_attribute(m, "ObjectiveValue") == pytest.approx(z1, abs=1e-12)
    np.testing.assert_allclose(m.solution.x, x1, atol=1e-10)


def test_delete_variables_plural_index_shift():
    m = new_model()
    pb = m.pbdata
    xs = [pb.add_variable((), (), float(j + 1), 0.0, 1.0, f"v{j}")
          for j in range(5)]
    pb.add_constraint(xs, [1.0] * 5, 2.0, INF)
    pb.delete_variables([xs[0], xs[2]])       # drop cost-1 and cost-3 vars
    assert tlp.get_attribute(m, "NumberOfVariables") == 3
    assert [tlp.get_attribute(m, "VariableName", index=j)
            for j in range(3)] == ["v1", "v3", "v4"]
    assert m.optimize() == OPT
    # Remaining costs (2, 4, 5): fill the cheapest two -> 2*1 + 4*1 = 6.
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 6.0) < 1e-7


def test_silent_mode_no_stdout(capsys):
    m = new_model(OutputLevel=0)
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 1.0)
    pb.add_constraint([x], [1.0], 0.5, 0.5)
    assert m.optimize() == OPT
    assert capsys.readouterr().out == ""


def test_constraint_primal_Ax():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), -1.0, 0.0, 2.0)
    y = pb.add_variable((), (), -1.0, 0.0, 2.0)
    pb.add_constraint([x, y], [1.0, 2.0], -INF, 4.0)
    assert m.optimize() == OPT
    Ax = float(m.solution.Ax[0])
    assert abs(Ax - (m.solution.x[0] + 2 * m.solution.x[1])) < 1e-8
    assert Ax <= 4.0 + 1e-7


def test_strong_duality_with_ranges():
    """Primal and dual objectives agree on an LP mixing range rows, bounds
    and free variables (the DualObjectiveValue formula's hard case)."""
    rng = np.random.default_rng(7)
    m = new_model()
    pb = m.pbdata
    n = 6
    cols = [pb.add_variable((), (), float(c), lb, ub, f"x{j}")
            for j, (c, lb, ub) in enumerate(zip(
                rng.standard_normal(n),
                [-INF, 0.0, -1.0, 0.0, -INF, -2.0],
                [INF, 2.0, 1.0, INF, 3.0, 2.0]))]
    A = rng.standard_normal((4, n))
    pb.add_constraint(cols, list(A[0]), 0.0, 1.0)     # range
    pb.add_constraint(cols, list(A[1]), -1.0, -1.0)   # equality
    pb.add_constraint(cols, list(A[2]), -INF, 2.0)    # <=
    pb.add_constraint(cols, list(A[3]), 0.5, INF)     # >=
    assert m.optimize() == OPT
    z = tlp.get_attribute(m, "ObjectiveValue")
    zd = tlp.get_attribute(m, "DualObjectiveValue")
    assert abs(z - zd) < 1e-6 * max(1.0, abs(z))
