"""ProblemData invariants (reference: test/Core/problemData.jl:1-201):
construction, deletion and modification keep the redundant row/column
storage consistent."""

import numpy as np
import pytest

from tulip_tpu.problem import INF, ProblemData


def check_consistency(pb: ProblemData):
    """Row view and column view must describe the same matrix."""
    A_rows = np.zeros((pb.ncon, pb.nvar))
    for i, row in enumerate(pb.arows):
        for j, v in row.items():
            A_rows[i, j] += v
    A_cols = np.zeros((pb.ncon, pb.nvar))
    for j, col in enumerate(pb.acols):
        for i, v in col.items():
            A_cols[i, j] += v
    np.testing.assert_array_equal(A_rows, A_cols)
    np.testing.assert_array_equal(A_rows, pb.to_dense())


def build_sample():
    pb = ProblemData("sample")
    x = pb.add_variable((), (), 1.0, 0.0, INF, "x")
    y = pb.add_variable((), (), 2.0, -1.0, 1.0, "y")
    z = pb.add_variable((), (), 0.0, -INF, INF, "z")
    pb.add_constraint([x, y], [1.0, 1.0], 1.0, 1.0, "c1")
    pb.add_constraint([x, y, z], [1.0, -1.0, 0.5], -INF, 0.0, "c2")
    pb.add_constraint([z], [2.0], 0.0, INF, "c3")
    return pb


def test_construction():
    pb = build_sample()
    assert pb.ncon == 3 and pb.nvar == 3
    assert pb.nnz == 6
    check_consistency(pb)
    assert pb.get_coefficient(1, 2) == 0.5
    assert pb.get_coefficient(0, 2) == 0.0


def test_add_variable_with_rows():
    pb = build_sample()
    w = pb.add_variable([0, 2], [3.0, -1.0], 1.0, 0.0, 5.0, "w")
    assert pb.nvar == 4
    assert pb.get_coefficient(0, w) == 3.0
    assert pb.get_coefficient(2, w) == -1.0
    check_consistency(pb)


def test_duplicate_coefficients_combine():
    pb = ProblemData()
    x = pb.add_variable()
    pb.add_constraint([x, x], [1.0, 2.0], 0.0, 1.0)
    assert pb.get_coefficient(0, x) == 3.0
    check_consistency(pb)


def test_delete_constraint():
    pb = build_sample()
    pb.delete_constraint(1)
    assert pb.ncon == 2
    assert pb.con_names == ["c1", "c3"]
    assert pb.get_coefficient(1, 2) == 2.0  # old c3 shifted up
    check_consistency(pb)


def test_delete_variable():
    pb = build_sample()
    pb.delete_variable(1)
    assert pb.nvar == 2
    assert pb.var_names == ["x", "z"]
    assert pb.get_coefficient(1, 1) == 0.5  # z's coefficient shifted
    check_consistency(pb)


def test_delete_multiple():
    pb = build_sample()
    pb.delete_constraints([0, 2])
    assert pb.ncon == 1 and pb.con_names == ["c2"]
    pb.delete_variables([0, 1])
    assert pb.nvar == 1 and pb.var_names == ["z"]
    check_consistency(pb)


def test_set_coefficient():
    pb = build_sample()
    pb.set_coefficient(0, 2, 7.0)   # new entry
    assert pb.get_coefficient(0, 2) == 7.0
    pb.set_coefficient(0, 0, 0.0)   # drop entry
    assert pb.get_coefficient(0, 0) == 0.0
    assert all(0 != j or True for j in pb.arows[0].nzind)
    assert 0 not in pb.arows[0].nzind
    check_consistency(pb)


def test_index_errors():
    pb = build_sample()
    with pytest.raises(IndexError):
        pb.add_constraint([99], [1.0], 0.0, 0.0)
    with pytest.raises(IndexError):
        pb.delete_variable(10)
    with pytest.raises(ValueError):
        pb.add_constraint([0], [1.0, 2.0], 0.0, 0.0)


def test_load_bulk():
    pb = ProblemData()
    pb.load(True, [1.0, 2.0], 0.5,
            ([0, 0, 1], [0, 1, 1], [1.0, 1.0, -1.0]),
            lcon=[1.0, -INF], ucon=[1.0, 0.0],
            lvar=[0.0, 0.0], uvar=[1.0, 1.0])
    assert pb.ncon == 2 and pb.nvar == 2
    assert pb.obj0 == 0.5
    assert pb.get_coefficient(1, 1) == -1.0
    check_consistency(pb)
