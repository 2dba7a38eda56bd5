"""MPS reader tests, incl. compressed variants
(reference: test/Interfaces/julia_api.jl:4-53)."""

import bz2
import gzip
import os

import pytest

from tulip_tpu.io.mps import parse_mps_lines, read_mps
from tulip_tpu.problem import INF

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_read_opt():
    pb = read_mps(os.path.join(DATA, "lp_opt.mps"))
    assert pb.name == "LPOPT"
    assert pb.ncon == 2 and pb.nvar == 2
    assert pb.obj == [1.0, 2.0]
    assert pb.lcon == [1.0, 0.0] and pb.ucon == [1.0, 0.0]
    assert pb.lvar == [0.0, 0.0] and pb.uvar == [1.0, 1.0]
    assert pb.get_coefficient(1, 1) == -1.0


@pytest.mark.parametrize("compress", ["gz", "bz2"])
def test_read_compressed(tmp_path, compress):
    src = os.path.join(DATA, "lp_opt.mps")
    data = open(src, "rb").read()
    if compress == "gz":
        path = tmp_path / "lp.mps.gz"
        path.write_bytes(gzip.compress(data))
    else:
        path = tmp_path / "lp.mps.bz2"
        path.write_bytes(bz2.compress(data))
    pb = read_mps(str(path))
    assert pb.ncon == 2 and pb.nvar == 2
    assert pb.obj == [1.0, 2.0]


def test_free_bounds():
    pb = read_mps(os.path.join(DATA, "lp_freevars.mps"))
    assert pb.lvar == [-INF] * 3
    assert pb.uvar == [INF] * 3
    assert pb.lcon == [2.0, 2.0, 0.0]
    assert pb.ucon == [INF] * 3


def test_ranges_and_bounds():
    text = """\
NAME T
OBJSENSE
    MAX
ROWS
 N obj
 L r1
 G r2
 E r3
COLUMNS
    x obj 1.0 r1 1.0
    x r2 1.0 r3 1.0
    y obj -1.0 r1 2.0
RHS
    rhs r1 10.0 r2 2.0
    rhs r3 5.0 obj 3.0
RANGES
    rng r1 4.0 r2 6.0
    rng r3 -2.0
BOUNDS
 MI b x
 UP b x 8.0
 FX b y 1.5
ENDATA
"""
    pb = parse_mps_lines(text.splitlines())
    assert pb.objsense is False  # MAX
    assert pb.obj0 == -3.0
    # r1: L with rhs 10, range 4 -> [6, 10]
    assert pb.lcon[0] == 6.0 and pb.ucon[0] == 10.0
    # r2: G with rhs 2, range 6 -> [2, 8]
    assert pb.lcon[1] == 2.0 and pb.ucon[1] == 8.0
    # r3: E with rhs 5, range -2 -> [3, 5]
    assert pb.lcon[2] == 3.0 and pb.ucon[2] == 5.0
    assert pb.lvar[0] == -INF and pb.uvar[0] == 8.0
    assert pb.lvar[1] == 1.5 and pb.uvar[1] == 1.5


def test_up_negative_quirk():
    text = """\
NAME T
ROWS
 N obj
 G r1
COLUMNS
    x obj 1.0 r1 1.0
RHS
    rhs r1 1.0
BOUNDS
 UP b x -2.0
ENDATA
"""
    pb = parse_mps_lines(text.splitlines())
    assert pb.uvar[0] == -2.0
    assert pb.lvar[0] == -INF


def test_write_read_roundtrip(tmp_path):
    """write_mps -> read_mps preserves the problem exactly (objective,
    bounds incl. range rows and free/fixed/negative bounds, constant,
    max sense), across plain and compressed files."""
    from tulip_tpu.io import read_mps, write_mps
    from tulip_tpu.problem import INF, ProblemData

    pb = ProblemData("RT")
    pb.objsense = False                 # max problem
    pb.obj0 = -2.5
    pb.add_variable((), (), 1.0, 0.0, INF, "x1")        # default bounds
    pb.add_variable((), (), -2.0, -INF, INF, "x2")      # free
    pb.add_variable((), (), 0.5, 1.5, 1.5, "x3")        # fixed
    pb.add_variable((), (), 0.0, -3.0, 4.0, "x4")       # two-sided
    pb.add_variable((), (), 3.0, -INF, -1.0, "x5")      # MI + negative UP
    pb.add_constraint([0, 1], [1.0, 2.0], 3.0, 3.0, "e1")       # E
    pb.add_constraint([1, 2], [1.0, -1.0], -INF, 5.0, "l1")     # L
    pb.add_constraint([2, 3], [2.0, 1.0], 1.0, INF, "g1")       # G
    pb.add_constraint([0, 4], [1.0, 1.0], -1.0, 2.0, "rng1")    # range

    for suffix in (".mps", ".mps.gz", ".mps.bz2"):
        path = str(tmp_path / f"rt{suffix}")
        write_mps(pb, path)
        pb2 = read_mps(path)
        assert pb2.objsense == pb.objsense
        assert pb2.obj0 == pb.obj0
        assert pb2.nvar == pb.nvar and pb2.ncon == pb.ncon
        assert pb2.var_names == pb.var_names
        assert pb2.con_names == pb.con_names
        assert pb2.obj == pb.obj
        assert pb2.lvar == pb.lvar and pb2.uvar == pb.uvar
        assert pb2.lcon == pb.lcon and pb2.ucon == pb.ucon
        for i in range(pb.ncon):
            assert list(pb2.arows[i].items()) == list(pb.arows[i].items())
