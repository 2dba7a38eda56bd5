"""Native C++ MPS tokenizer: equivalence with the pure-Python parser."""

import os

import numpy as np
import pytest

from tulip_tpu.io.mps import parse_mps_lines, read_mps
from tulip_tpu.io.native import native_available, parse_mps_native

DATA = os.path.join(os.path.dirname(__file__), "data")

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native tokenizer not built")


def assert_pb_equal(a, b):
    assert a.ncon == b.ncon and a.nvar == b.nvar
    assert a.objsense == b.objsense
    assert a.obj0 == b.obj0
    assert a.obj == b.obj
    assert a.lvar == b.lvar and a.uvar == b.uvar
    assert a.lcon == b.lcon and a.ucon == b.ucon
    assert a.con_names == b.con_names
    assert a.var_names == b.var_names
    np.testing.assert_array_equal(a.to_dense(), b.to_dense())


@pytest.mark.parametrize("fname", ["lp_opt.mps", "lp_inf.mps",
                                   "lp_ubd.mps", "lp_freevars.mps"])
def test_native_matches_python(fname):
    path = os.path.join(DATA, fname)
    text = open(path).read()
    pb_py = parse_mps_lines(text.splitlines(), name_hint=fname)
    pb_nat = parse_mps_native(text.encode(), name_hint=fname)
    assert pb_nat is not None
    assert_pb_equal(pb_nat, pb_py)


def test_native_ranges_bounds_objsense():
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
    pb_py = parse_mps_lines(text.splitlines())
    pb_nat = parse_mps_native(text.encode())
    assert_pb_equal(pb_nat, pb_py)


def test_native_error_fallback(tmp_path):
    bad = tmp_path / "bad.mps"
    bad.write_text("GARBAGE SECTION\n x y z\n")
    with pytest.raises(ValueError):
        read_mps(str(bad))


def test_native_duplicate_combination():
    text = """\
NAME D
ROWS
 N obj
 E r1
COLUMNS
    x obj 1.0 r1 1.0
    x r1 2.0
ENDATA
"""
    pb_py = parse_mps_lines(text.splitlines())
    pb_nat = parse_mps_native(text.encode())
    assert pb_py.get_coefficient(0, 0) == 3.0
    assert_pb_equal(pb_nat, pb_py)


def test_native_speed_on_large_instance(tmp_path):
    """Generate a ~material MPS file and require the native path to parse
    it faster than the Python path."""
    import time

    rng = np.random.default_rng(0)
    m_, n_, per_col = 2000, 4000, 6
    lines = ["NAME BIG", "ROWS", " N obj"]
    lines += [f" E r{i}" for i in range(m_)]
    lines.append("COLUMNS")
    for j in range(n_):
        rowids = rng.choice(m_, per_col, replace=False)
        parts = [f"    x{j} obj {rng.standard_normal():.6f}"]
        for i in rowids:
            parts.append(f"    x{j} r{i} {rng.standard_normal():.6f}")
        lines += parts
    lines.append("RHS")
    for i in range(0, m_, 2):
        lines.append(f"    rhs r{i} {rng.standard_normal():.6f}")
    lines.append("ENDATA")
    text = "\n".join(lines) + "\n"

    t0 = time.time()
    pb_py = parse_mps_lines(text.splitlines())
    t_py = time.time() - t0
    t0 = time.time()
    pb_nat = parse_mps_native(text.encode())
    t_nat = time.time() - t0
    assert_pb_equal(pb_nat, pb_py)
    # Tokenization should be several times faster natively.
    assert t_nat < t_py, f"native {t_nat:.3f}s not faster than {t_py:.3f}s"
