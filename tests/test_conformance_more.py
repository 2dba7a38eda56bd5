"""Solver-conformance battery, part 2.

Extends tests/test_conformance.py toward the breadth of the reference's
MOI.Test.runtests coverage (reference: test/Interfaces/MOI_wrapper.jl:11-92):
certificate validity inequalities, dual sign conventions per constraint
type, complementary slackness, degenerate/rank-deficient inputs, scaling
robustness, and modification corner cases.
"""

import numpy as np
import pytest

import tulip_tpu as tlp
from tulip_tpu.problem import INF
from tulip_tpu.status import TerminationStatus

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


# ---------------------------------------------------------------- bounds --

def test_free_variable_in_constraint():
    """Free variable pinned only through a row (MOI linear tests include
    free-variable LPs; reference example: examples/freevars.jl)."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, -INF, INF)
    pb.add_constraint([x], [1.0], 3.0, 3.0)
    assert m.optimize() == OPT
    assert abs(m.solution.x[0] - 3.0) < 1e-7


def test_lower_only_and_upper_only_bounds():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, -4.0, INF)   # min x, x >= -4
    y = pb.add_variable((), (), -1.0, -INF, 7.0)  # min -y, y <= 7
    assert m.optimize() == OPT
    assert abs(m.solution.x[0] + 4.0) < 1e-7
    assert abs(m.solution.x[1] - 7.0) < 1e-7
    assert abs(tlp.get_attribute(m, "ObjectiveValue") + 11.0) < 1e-6


def test_negative_bound_box():
    m = new_model()
    pb = m.pbdata
    pb.add_variable((), (), 1.0, -5.0, -2.0)
    assert m.optimize() == OPT
    assert abs(m.solution.x[0] + 5.0) < 1e-8


# ------------------------------------------------------- duals and slack --

def test_leq_row_dual_sign():
    """Active <= row: dual y <= 0 in the combined convention, i.e. the
    y_upper part is positive (reference sign split: solution.jl:10-16)."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), -1.0, 0.0, INF)   # max x
    pb.add_constraint([x], [1.0], -INF, 2.0)      # x <= 2 active
    assert m.optimize() == OPT
    assert m.solution.y_upper[0] > 1e-7
    assert m.solution.y_lower[0] < 1e-6


def test_geq_row_dual_sign():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, INF)    # min x
    pb.add_constraint([x], [1.0], 2.0, INF)       # x >= 2 active
    assert m.optimize() == OPT
    assert m.solution.y_lower[0] > 1e-7
    assert m.solution.y_upper[0] < 1e-6


def test_reduced_cost_at_bounds():
    """Reduced costs split into s_lower/s_upper >= 0: a variable at its
    lower bound carries s_lower = c_j - a_j'y > 0, one at its upper bound
    carries s_upper > 0 (reference: solution.jl:17-21)."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 1.0)    # at lower in optimum
    y = pb.add_variable((), (), -1.0, 0.0, 1.0)   # at upper in optimum
    assert m.optimize() == OPT
    assert m.solution.s_lower[x] > 1e-7
    assert m.solution.s_upper[x] < 1e-6
    assert m.solution.s_upper[y] > 1e-7
    assert m.solution.s_lower[y] < 1e-6


def test_complementary_slackness():
    """x'(c - A'y) = y'(Ax - b) = 0 at optimality (within tolerance) on a
    random feasible LP."""
    rng = np.random.default_rng(21)
    m = new_model()
    pb = m.pbdata
    n, mr = 8, 4
    cols = [pb.add_variable((), (), float(cj), 0.0, 5.0)
            for cj in rng.standard_normal(n)]
    A = rng.standard_normal((mr, n))
    x0 = rng.uniform(1, 4, n)
    b = A @ x0
    for i in range(mr):
        pb.add_constraint(cols, list(A[i]), float(b[i]), float(b[i]))
    assert m.optimize() == OPT
    sol = m.solution
    x = np.asarray(sol.x)
    y = np.asarray(sol.y_lower) - np.asarray(sol.y_upper)
    sl = np.asarray(sol.s_lower)
    su = np.asarray(sol.s_upper)
    # Stationarity: c - A'y - sl + su = 0.
    np.testing.assert_allclose(np.array([pb.obj[j] for j in range(n)]),
                               A.T @ y + sl - su, atol=1e-5)
    # Complementarity with the bound gaps.
    assert float(sl @ x) < 1e-4
    assert float(su @ (5.0 - x)) < 1e-4


# ------------------------------------------------------------ certificates --

def test_farkas_certificate_inequalities(_x4_config):
    """The returned dual ray is a genuine Farkas certificate:
    A'y <= 0 componentwise (for x >= 0 rows) and b'y > 0
    (reference asserts the same inequalities, examples/infeasible.jl:37-53).

    Ray inequalities are asserted for HSD only: the reference documents
    MPC's infeasibility certificates as weaker than HSD's (reference:
    src/IPM/MPC/MPC.jl:185-208 detects divergence without building a
    certified ray)."""
    algo, _ = _x4_config
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, INF)
    y = pb.add_variable((), (), 1.0, 0.0, INF)
    # x + y >= 4 and x + y <= 1: infeasible.
    pb.add_constraint([x, y], [1.0, 1.0], 4.0, INF)
    pb.add_constraint([x, y], [1.0, 1.0], -INF, 1.0)
    assert m.optimize() == TerminationStatus.PRIMAL_INFEASIBLE
    sol = m.solution
    assert sol.is_dual_ray
    if algo != "HSD":
        return
    yr = np.asarray(sol.y_lower) - np.asarray(sol.y_upper)
    A = np.array([[1.0, 1.0], [1.0, 1.0]])
    # A'y - s = 0 with s = sl - su; variables have no upper bound so the
    # certificate needs A'y <= 0 ... here both columns identical.
    aty = A.T @ yr
    assert np.all(aty <= 1e-7)
    # "b'y" for range rows: sum of l_i*(y_i)+ - u_i*(y_i)- > 0.
    lb = np.array([4.0, -np.inf])
    ub = np.array([np.inf, 1.0])
    val = float(np.where(yr > 0, np.where(np.isfinite(lb), lb, 0.0) * yr,
                         np.where(np.isfinite(ub), ub, 0.0) * yr).sum())
    assert val > 1e-8


def test_unbounded_certificate_inequalities():
    """Primal ray: A d = 0 on equality rows, c'd < 0
    (reference: examples/unbounded.jl behavior)."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), -2.0, 0.0, INF)
    y = pb.add_variable((), (), 1.0, 0.0, INF)
    pb.add_constraint([x, y], [1.0, -1.0], 0.0, 0.0)   # x = y
    assert m.optimize() == TerminationStatus.DUAL_INFEASIBLE
    sol = m.solution
    assert sol.is_primal_ray
    d = np.asarray(sol.x)
    assert abs(d[0] - d[1]) < 1e-6 * max(1.0, abs(d[0]))  # A d = 0
    assert -2 * d[0] + d[1] < -1e-8                        # c'd < 0


# ----------------------------------------------------------- degeneracy --

def test_rank_deficient_rows():
    """Duplicated equality rows (rank-deficient A): primal-dual
    regularization must still produce the optimum (the reference relies on
    the same mechanism, src/IPM/HSD/step.jl:29-51)."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, INF)
    y = pb.add_variable((), (), 2.0, 0.0, INF)
    pb.add_constraint([x, y], [1.0, 1.0], 2.0, 2.0)
    pb.add_constraint([x, y], [1.0, 1.0], 2.0, 2.0)   # duplicate
    pb.add_constraint([x, y], [2.0, 2.0], 4.0, 4.0)   # scaled duplicate
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 2.0) < 1e-6


def test_degenerate_vertex():
    """More active constraints than dimensions at the optimum."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, INF)
    y = pb.add_variable((), (), 1.0, 0.0, INF)
    pb.add_constraint([x, y], [1.0, 0.0], 0.0, INF)
    pb.add_constraint([x, y], [0.0, 1.0], 0.0, INF)
    pb.add_constraint([x, y], [1.0, 1.0], 0.0, INF)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue")) < 1e-7


def test_large_coefficient_scale():
    """Row/col equilibration (reference: Presolve.jl:256-300) keeps badly
    scaled problems solvable: coefficients spanning 1e6.

    Equilibration is a presolve-extract feature — the reference only scales
    inside extract_reduced_problem! when Level > 0 (reference:
    src/model.jl:88-123) — so this behavior is pinned to presolve-on."""
    m = new_model()
    m.params.Presolve.Level = 1
    pb = m.pbdata
    x = pb.add_variable((), (), 1e6, 0.0, INF)
    y = pb.add_variable((), (), 1e-3, 0.0, INF)
    pb.add_constraint([x, y], [1e6, 1.0], 1e6, INF)
    assert m.optimize() == OPT
    z = tlp.get_attribute(m, "ObjectiveValue")
    # Optimum: y = 1e6 (cost 1e3) beats x = 1 (cost 1e6).
    assert abs(z - 1e3) < 1e-3 * max(1.0, abs(z))


# -------------------------------------------------------- modifications --

def test_empty_constraint_feasible_and_infeasible():
    """Empty rows: kept if 0 in [l, u], Farkas certificate otherwise
    (reference: src/Presolve/empty_row.jl:4-78)."""
    m = new_model()
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 0.0, 1.0)
    pb.add_constraint([], [], -1.0, 1.0)          # 0 in [-1, 1]: ok
    assert m.optimize() == OPT
    m2 = new_model()
    pb2 = m2.pbdata
    pb2.add_variable((), (), 1.0, 0.0, 1.0)
    pb2.add_constraint([], [], 2.0, 3.0)          # 0 not in [2, 3]
    assert m2.optimize() == TerminationStatus.PRIMAL_INFEASIBLE
    assert m2.solution.is_dual_ray


def test_set_coefficient_to_zero_drops_entry():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, INF)
    y = pb.add_variable((), (), 1.0, 0.0, INF)
    ci = pb.add_constraint([x, y], [1.0, 1.0], 2.0, 2.0)
    pb.set_coefficient(ci, x, 0.0)
    assert pb.get_coefficient(ci, x) == 0.0
    assert m.optimize() == OPT
    # Row is now y = 2 alone; x free to sit at 0.
    assert abs(m.solution.x[1] - 2.0) < 1e-7
    assert abs(m.solution.x[0]) < 1e-6


def test_objective_constant_modification_resolve():
    m = new_model()
    pb = m.pbdata
    pb.add_variable((), (), 1.0, 1.0, 2.0)
    assert m.optimize() == OPT
    z1 = tlp.get_attribute(m, "ObjectiveValue")
    tlp.set_attribute(m, "ObjectiveConstant", 5.0)
    assert tlp.get_attribute(m, "ObjectiveConstant") == 5.0
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - (z1 + 5.0)) < 1e-8


def test_delete_all_variables_then_solve():
    m = new_model()
    pb = m.pbdata
    xs = [pb.add_variable((), (), 1.0, 0.0, 1.0) for _ in range(3)]
    pb.add_constraint(xs, [1.0] * 3, 0.0, 3.0)
    pb.delete_variables(xs)
    assert tlp.get_attribute(m, "NumberOfVariables") == 0
    assert m.optimize() == OPT
    assert tlp.get_attribute(m, "ObjectiveValue") == 0.0


def test_delete_constraints_plural_index_shift():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 10.0)
    cis = [pb.add_constraint([x], [1.0], float(k), INF, f"r{k}")
           for k in (1, 2, 3, 4)]
    pb.delete_constraints([cis[1], cis[3]])      # keep x >= 1, x >= 3
    assert tlp.get_attribute(m, "NumberOfConstraints") == 2
    assert [tlp.get_attribute(m, "ConstraintName", index=i)
            for i in range(2)] == ["r1", "r3"]
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 3.0) < 1e-7


def test_grow_model_after_solve():
    """Adding rows/cols after a solve re-solves correctly (incremental
    interface, reference: MOI_wrapper.jl:181)."""
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 10.0)
    pb.add_constraint([x], [1.0], 1.0, INF)
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 1.0) < 1e-7
    y = pb.add_variable((), (), 0.5, 0.0, 10.0)
    pb.add_constraint([x, y], [1.0, 1.0], 4.0, INF)
    assert m.optimize() == OPT
    # Cheapest way to reach 4 once x >= 1: x = 1, y = 3 -> 2.5.
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 2.5) < 1e-6


# -------------------------------------------------------------- queries --

def test_bound_attribute_queries():
    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, -1.5, 2.5)
    ci = pb.add_constraint([x], [1.0], -0.5, 0.75)
    assert tlp.get_attribute(m, "VariableLowerBound", index=x) == -1.5
    assert tlp.get_attribute(m, "VariableUpperBound", index=x) == 2.5
    assert tlp.get_attribute(m, "ConstraintLowerBound", index=ci) == -0.5
    assert tlp.get_attribute(m, "ConstraintUpperBound", index=ci) == 0.75


def test_solution_statuses_on_optimal():
    from tulip_tpu.status import SolutionStatus

    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 1.0)
    pb.add_constraint([x], [1.0], 0.5, 0.5)
    assert m.optimize() == OPT
    assert m.solution.primal_status in (SolutionStatus.OPTIMAL,
                                        SolutionStatus.FEASIBLE_POINT)
    assert m.solution.dual_status in (SolutionStatus.OPTIMAL,
                                      SolutionStatus.FEASIBLE_POINT)
    assert not m.solution.is_primal_ray
    assert not m.solution.is_dual_ray


def test_solution_statuses_on_certificates():
    from tulip_tpu.status import SolutionStatus

    m = new_model()
    pb = m.pbdata
    pb.add_variable((), (), -1.0, 0.0, INF)
    assert m.optimize() == TerminationStatus.DUAL_INFEASIBLE
    assert m.solution.primal_status == SolutionStatus.INFEASIBILITY_CERTIFICATE


@pytest.mark.parametrize("algo", ["HSD", "MPC"])
def test_both_algorithms_agree(algo):
    """HSD and MPC converge to the same optimum on a nontrivial LP
    (reference parametrizes its example tests the same way,
    test/examples.jl:3-36)."""
    rng = np.random.default_rng(33)
    m = new_model(IPM_Algorithm=algo)
    pb = m.pbdata
    n, mr = 10, 5
    cols = [pb.add_variable((), (), float(cj), 0.0, 3.0)
            for cj in rng.standard_normal(n)]
    A = rng.standard_normal((mr, n))
    b = A @ rng.uniform(0.5, 2.5, n)
    for i in range(mr):
        pb.add_constraint(cols, list(A[i]), float(b[i]), float(b[i]))
    assert m.optimize() == OPT
    from scipy.optimize import linprog
    ref = linprog([pb.obj[j] for j in range(n)], A_eq=A, b_eq=b,
                  bounds=[(0.0, 3.0)] * n, method="highs")
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - ref.fun) \
        < 1e-7 * max(1.0, abs(ref.fun))


def test_presolve_solves_fully_reducible_model():
    """A model presolve reduces to nothing terminates OPTIMAL without the
    IPM and still reports the right objective and duals
    (reference: Presolve.jl:442-454). Inherently a presolve behavior —
    pinned to Level 1."""
    m = new_model()
    m.params.Presolve.Level = 1
    pb = m.pbdata
    x = pb.add_variable((), (), 2.0, 1.5, 1.5)        # fixed
    pb.add_constraint([x], [1.0], 0.0, 2.0)           # then empty row
    assert m.optimize() == OPT
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 3.0) < 1e-12
    assert tlp.get_attribute(m, "BarrierIterations") == 0
    assert m.solution.x[0] == 1.5


def test_mps_roundtrip_preserves_solution(tmp_path):
    """write_mps -> load_problem roundtrip reproduces the same optimum."""
    from tulip_tpu.io.mps import write_mps

    m = new_model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 0.0, 2.0, "x1")
    y = pb.add_variable((), (), 2.0, 0.0, 2.0, "x2")
    pb.add_constraint([x, y], [1.0, 1.0], 1.5, 3.0, "ROW1")
    assert m.optimize() == OPT
    z1 = tlp.get_attribute(m, "ObjectiveValue")
    path = str(tmp_path / "rt.mps")
    write_mps(pb, path)
    m2 = new_model()
    tlp.load_problem(m2, path)
    assert m2.optimize() == OPT
    assert abs(tlp.get_attribute(m2, "ObjectiveValue") - z1) < 1e-9
