"""Presolve rule micro-tests + pipeline tests.

Mirrors the reference's per-rule micro-LP pattern (reference:
test/Presolve/*.jl): each rule exercised on a tiny LP, checking flags,
recorded transformation, and certificates; plus end-to-end solves with
presolve on, validated against scipy HiGHS.
"""

import numpy as np
import pytest

import tulip_tpu as tlp
from tulip_tpu.presolve import PresolveData, postsolve
from tulip_tpu.presolve import ops as OPS
from tulip_tpu.problem import INF, ProblemData
from tulip_tpu.solution import Solution
from tulip_tpu.status import SolutionStatus, TerminationStatus


def test_empty_row_removed():
    """Empty row with feasible bounds is dropped
    (reference: test/Presolve/empty_row.jl)."""
    pb = ProblemData()
    x = pb.add_variable((), (), 1.0, 0.0, 1.0)
    pb.add_constraint([x], [1.0], 0.0, 1.0)
    pb.add_constraint([], [], -1.0, 1.0)  # empty, 0 in [-1,1]
    ps = PresolveData(pb)
    ps.remove_empty_rows()
    assert ps.status == TerminationStatus.UNKNOWN
    assert ps.rowflag == [True, False]
    assert ps.nrow == 1
    assert isinstance(ps.ops[-1], OPS.EmptyRow)


def test_empty_row_infeasible_farkas():
    """Empty row with 0 outside bounds -> Farkas certificate
    (reference: empty_row.jl:19-63)."""
    pb = ProblemData()
    pb.add_variable((), (), 1.0, 0.0, 1.0)
    pb.add_constraint([], [], 1.0, 2.0)  # 0 != [1,2] -> infeasible
    ps = PresolveData(pb)
    st = ps.presolve()
    assert st == TerminationStatus.PRIMAL_INFEASIBLE
    assert ps.solution.dual_status == SolutionStatus.INFEASIBILITY_CERTIFICATE
    assert ps.solution.is_dual_ray
    # The ray must be positive on the offending row's y_lower.
    assert ps.solution.y_lower[0] > 0


def test_empty_column_fix_and_unbounded():
    """Empty column: fixed to bound by cost sign; unbounded if no bound
    (reference: test/Presolve/empty_column.jl)."""
    pb = ProblemData()
    pb.add_variable((), (), 2.0, 0.5, INF)  # c>0, finite lb -> fix at 0.5
    ps = PresolveData(pb)
    ps.remove_empty_column(0)
    assert ps.colflag == [False]
    op = ps.ops[-1]
    assert isinstance(op, OPS.EmptyColumn)
    assert op.x == 0.5 and op.s == 2.0
    assert ps.obj0 == 1.0

    pb2 = ProblemData()
    pb2.add_variable((), (), -1.0, 0.0, INF)  # c<0, no ub -> unbounded
    ps2 = PresolveData(pb2)
    st = ps2.presolve()
    assert st == TerminationStatus.DUAL_INFEASIBLE
    assert ps2.solution.is_primal_ray
    assert ps2.solution.x[0] == 1.0


def test_fixed_variable():
    """l == u substitutes into rows (reference: test/Presolve/fixed_variable.jl)."""
    pb = ProblemData()
    x = pb.add_variable((), (), 1.0, 2.0, 2.0)   # fixed at 2
    y = pb.add_variable((), (), 1.0, 0.0, 10.0)
    pb.add_constraint([x, y], [3.0, 1.0], 0.0, 8.0)
    ps = PresolveData(pb)
    ps.remove_fixed_variables()
    assert ps.colflag == [False, True]
    assert ps.obj0 == 2.0
    # Row bounds shifted by 3*2=6.
    assert ps.lrow[0] == -6.0 and ps.urow[0] == 2.0
    assert ps.nzrow[0] == 1
    op = ps.ops[-1]
    assert isinstance(op, OPS.FixedVariable)
    assert op.x == 2.0 and op.c == 1.0


def test_row_singleton_tightens_bounds():
    pb = ProblemData()
    x = pb.add_variable((), (), 1.0, 0.0, 10.0)
    y = pb.add_variable((), (), 1.0, 0.0, 10.0)
    pb.add_constraint([x], [2.0], 2.0, 8.0)   # singleton: 1 <= x <= 4
    pb.add_constraint([x, y], [1.0, 1.0], 0.0, 5.0)
    ps = PresolveData(pb)
    ps.row_singletons = [0]
    ps.remove_row_singletons()
    assert ps.rowflag == [False, True]
    assert ps.lcol[0] == 1.0 and ps.ucol[0] == 4.0
    op = ps.ops[-1]
    assert isinstance(op, OPS.RowSingleton)
    assert op.force_lower and op.force_upper


def test_forcing_row_fixes_all_variables():
    """Row with implied l_ == u forces all its variables to bounds
    (reference: test/Presolve/forcing_row ops)."""
    pb = ProblemData()
    x = pb.add_variable((), (), 1.0, 0.0, 2.0)
    y = pb.add_variable((), (), -1.0, 0.0, 3.0)
    # x + y >= 0 is dominated (implied [0, 5]); x - y >= 2 with implied
    # [-3, 2] forces x=2, y=0.
    pb.add_constraint([x, y], [1.0, 1.0], 0.0, INF)
    pb.add_constraint([x, y], [1.0, -1.0], 2.0, INF)
    ps = PresolveData(pb)
    ps.remove_forcing_rows()
    ops_types = [type(o) for o in ps.ops]
    assert OPS.DominatedRow in ops_types
    assert OPS.ForcingRow in ops_types
    assert ps.colflag == [False, False]


def test_free_column_singleton_substitution():
    """Free column singleton eliminates variable and row
    (reference: test/Presolve/free_column_singleton pattern)."""
    pb = ProblemData()
    x = pb.add_variable((), (), 1.0, 0.0, 5.0)
    z = pb.add_variable((), (), 2.0, -INF, INF)  # free singleton
    pb.add_constraint([x, z], [1.0, 1.0], 3.0, 3.0)
    pb.add_constraint([x], [1.0], 0.0, 4.0)
    ps = PresolveData(pb)
    ps.remove_free_column_singletons()
    assert ps.colflag == [True, False]
    assert ps.rowflag == [False, True]
    op = ps.ops[-1]
    assert isinstance(op, OPS.FreeColumnSingleton)
    # y = c_z / a = 2; objective of x updated: 1 - 2*1 = -1; obj0 += y*lr = 6.
    assert op.y == 2.0
    assert ps.obj[0] == -1.0
    assert ps.obj0 == 6.0


def test_dominated_column():
    """Column-singleton dual bounds make another column dominated
    (reference: Presolve.jl:648-710, dominated_column.jl)."""
    pb = ProblemData()
    # Singleton x (lb only, a>0) forces y_row <= cx/a = 1.
    x = pb.add_variable((), (), 1.0, 0.0, INF)
    # Column w in same row with c_w - us > 0 -> fixed at lower bound.
    w = pb.add_variable((), (), 5.0, 1.0, INF)
    pb.add_constraint([x, w], [1.0, 2.0], 0.0, INF)
    ps = PresolveData(pb)
    ps.remove_dominated_columns()
    # us(w) = 2 * uy = 2; c_w - us = 3 > 0 -> fix w at 1.
    assert ps.colflag == [True, False]
    op = ps.ops[-1]
    assert isinstance(op, OPS.DominatedColumn)
    assert op.x == 1.0
    assert ps.obj0 == 5.0


def test_bounds_inconsistency_certificates():
    pb = ProblemData()
    pb.add_variable((), (), 1.0, 2.0, 1.0)  # l > u
    ps = PresolveData(pb)
    st = ps.presolve()
    assert st == TerminationStatus.PRIMAL_INFEASIBLE
    assert ps.solution.s_lower[0] == 1.0 and ps.solution.s_upper[0] == 1.0


def test_presolve_solves_entire_problem():
    """Problem fully reduced by presolve -> OPTIMAL without IPM, with
    correct postsolved solution (reference: model.jl:105-119)."""
    m = tlp.Model()
    pb = m.pbdata
    x = pb.add_variable((), (), 1.0, 2.0, 2.0)     # fixed
    y = pb.add_variable((), (), 3.0, 1.0, INF)     # empty after x removed
    pb.add_constraint([x], [1.0], 0.0, 4.0)        # becomes empty
    st = m.optimize()
    assert st == TerminationStatus.OPTIMAL
    assert m.solver_state is None  # IPM never ran
    np.testing.assert_allclose(m.solution.x, [2.0, 1.0])
    assert abs(tlp.get_attribute(m, "ObjectiveValue") - 5.0) < 1e-12


@pytest.mark.parametrize("algo", ["HSD", "MPC"])
def test_end_to_end_with_presolve_random(algo):
    """Random LPs with redundant structure: presolve on vs off must agree
    with each other and with HiGHS."""
    from scipy.optimize import linprog

    rng = np.random.default_rng(11)
    for trial in range(4):
        m_, n_ = 8, 14
        A = rng.standard_normal((m_, n_))
        A[:, rng.integers(0, n_)] = 0.0          # empty column
        u = rng.uniform(1.0, 3.0, n_)
        x0 = u * rng.uniform(0.2, 0.8, n_)
        b = A @ x0
        c = rng.standard_normal(n_)
        jfix = rng.integers(0, n_)
        lo = np.zeros(n_)
        lo[jfix] = u[jfix] = x0[jfix]            # fixed variable

        r = linprog(c, A_eq=A, b_eq=b,
                    bounds=list(zip(lo, u)), method="highs")
        assert r.status == 0

        for level in (0, 1):
            m = tlp.Model()
            m.params.IPM.Algorithm = algo
            m.params.Presolve.Level = level
            pb = m.pbdata
            for j in range(n_):
                pb.add_variable((), (), c[j], lo[j], u[j])
            for i in range(m_):
                cols = [j for j in range(n_) if A[i, j] != 0.0]
                pb.add_constraint(cols, [A[i, j] for j in cols], b[i], b[i])
            st = m.optimize()
            assert st == TerminationStatus.OPTIMAL, (trial, level)
            z = tlp.get_attribute(m, "ObjectiveValue")
            assert abs(z - r.fun) < 1e-6 * max(1, abs(r.fun)), (trial, level)
            # Check dual feasibility of postsolved duals: c - A'y - s == 0.
            s = m.solution.s_lower - m.solution.s_upper
            y = m.solution.y_lower - m.solution.y_upper
            resid = c - A.T @ y - s
            assert np.max(np.abs(resid)) < 1e-6, (trial, level)


def test_postsolve_scaling_roundtrip():
    """Scaling applied at extraction must be undone exactly in postsolve."""
    rng = np.random.default_rng(5)
    pb = ProblemData()
    n_ = 6
    scale = 10.0 ** rng.uniform(-2, 2, n_)
    c = rng.standard_normal(n_) * scale
    u = rng.uniform(1, 2, n_)
    for j in range(n_):
        pb.add_variable((), (), c[j], 0.0, u[j])
    A = rng.standard_normal((3, n_)) * scale[None, :]
    x0 = u * 0.5
    b = A @ x0
    for i in range(3):
        pb.add_constraint(list(range(n_)), list(A[i]), b[i], b[i])

    m = tlp.Model()
    m.pbdata = pb
    m.params.Presolve.Level = 1
    st = m.optimize()
    assert st == TerminationStatus.OPTIMAL

    from scipy.optimize import linprog
    r = linprog(c, A_eq=A, b_eq=b, bounds=list(zip(np.zeros(n_), u)),
                method="highs")
    z = tlp.get_attribute(m, "ObjectiveValue")
    assert abs(z - r.fun) < 1e-6 * max(1, abs(r.fun))
    np.testing.assert_allclose(m.solution.Ax, A @ m.solution.x, atol=1e-8)


def test_extract_reduced_arrays_matches_list_path():
    """The vectorized extraction produces the same reduced problem and the
    same scaling as the list-based path."""
    import numpy as np

    from tests.test_native_presolve import random_lp
    from tulip_tpu.presolve.presolve import PresolveData
    from tulip_tpu.status import TerminationStatus

    checked = 0
    for seed in range(40):
        pb = random_lp(seed + 1000)
        ps1 = PresolveData(pb)
        if ps1.presolve() != TerminationStatus.UNKNOWN:
            continue
        red1 = ps1.extract_reduced_problem()
        ps2 = PresolveData(pb)
        ps2.presolve()
        red2 = ps2.extract_reduced_arrays()

        assert (red1.ncon, red1.nvar) == (red2.ncon, red2.nvar)
        np.testing.assert_allclose(ps2.row_scaling, ps1.row_scaling,
                                   rtol=1e-13)
        np.testing.assert_allclose(ps2.col_scaling, ps1.col_scaling,
                                   rtol=1e-13)
        for f in ("obj", "lcon", "ucon", "lvar", "uvar"):
            np.testing.assert_allclose(
                np.asarray(getattr(red2, f), dtype=float),
                np.asarray(getattr(red1, f), dtype=float), rtol=1e-13,
                err_msg=f"{f} seed={seed}")
        assert red2.obj0 == pytest.approx(red1.obj0, rel=1e-13)
        A1 = np.zeros((red1.ncon, red1.nvar))
        I, J, V = red1.to_coo()
        if len(I):
            A1[I, J] = V
        A2 = np.zeros_like(A1)
        I, J, V = red2.to_coo()
        if len(I):
            A2[I, J] = V
        np.testing.assert_allclose(A2, A1, rtol=1e-13)
        checked += 1
    assert checked >= 10
