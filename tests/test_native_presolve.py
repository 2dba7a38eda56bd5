"""Differential tests: native C++ presolve engine vs the Python engine.

native/presolve.cpp mirrors tulip_tpu/presolve/presolve.py scan for scan,
so on ANY input both must produce identical op streams, flags, bounds,
objective, status and certificates. Random LPs are generated with features
that exercise every rule (empty rows/columns, fixed variables, row
singletons, forcing rows, free column singletons, dominated columns,
infeasible and unbounded patterns).
"""

import dataclasses
import math

import numpy as np
import pytest

from tulip_tpu.presolve.native import native_available, presolve_native
from tulip_tpu.presolve.presolve import PresolveData
from tulip_tpu.problem import INF, ProblemData

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native presolve lib unavailable")


def random_lp(seed: int) -> ProblemData:
    rng = np.random.default_rng(seed)
    m = int(rng.integers(3, 25))
    n = int(rng.integers(3, 40))
    density = rng.uniform(0.05, 0.5)
    A = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)

    # Sprinkle rule triggers.
    if m > 4 and rng.random() < 0.7:
        A[rng.integers(0, m)] = 0.0                       # empty row
    if n > 4 and rng.random() < 0.7:
        A[:, rng.integers(0, n)] = 0.0                    # empty column
    if m > 4 and rng.random() < 0.7:
        i = rng.integers(0, m)                            # row singleton
        A[i] = 0.0
        A[i, rng.integers(0, n)] = rng.standard_normal() or 1.0
    if n > 4 and rng.random() < 0.7:
        j = rng.integers(0, n)                            # column singleton
        A[:, j] = 0.0
        A[rng.integers(0, m), j] = rng.standard_normal() or 1.0

    obj = rng.standard_normal(n)
    lvar = np.where(rng.random(n) < 0.8, 0.0, -INF)
    uvar = np.where(rng.random(n) < 0.6, rng.uniform(0.5, 5.0, n), INF)
    if rng.random() < 0.5:
        j = rng.integers(0, n)                            # fixed variable
        lvar[j] = uvar[j] = rng.uniform(-1, 1)
    if rng.random() < 0.2:
        j = rng.integers(0, n)                            # free variable
        lvar[j], uvar[j] = -INF, INF

    x0 = np.where(np.isfinite(uvar), np.minimum(np.maximum(0.3, lvar),
                                                np.where(np.isfinite(uvar),
                                                         uvar, 1.0)), 0.7)
    act = A @ x0
    kind = rng.random(m)
    lcon = np.where(kind < 0.4, act - np.abs(rng.standard_normal(m)), act)
    ucon = np.where(kind > 0.6, act + np.abs(rng.standard_normal(m)), act)
    lcon = np.where(kind >= 0.4, lcon, np.where(rng.random(m) < 0.3,
                                                -INF, lcon))
    ucon = np.where(kind <= 0.6, ucon, np.where(rng.random(m) < 0.3,
                                                INF, ucon))
    if rng.random() < 0.15:
        i = rng.integers(0, m)                            # infeasible row
        lcon[i], ucon[i] = 2.0, 1.0

    I, J, V = [], [], []
    for i in range(m):
        for j in range(n):
            if A[i, j] != 0.0:
                I.append(i); J.append(j); V.append(float(A[i, j]))
    pb = ProblemData(f"fuzz{seed}")
    pb.load(bool(rng.random() < 0.8), obj.tolist(), float(rng.standard_normal()),
            (I, J, V), lcon.tolist(), ucon.tolist(),
            lvar.tolist(), uvar.tolist())
    return pb


def _op_fields(op):
    d = dataclasses.asdict(op)
    d["__type__"] = type(op).__name__
    return d


def _cmp_vals(a, b, path):
    if isinstance(a, float):
        if math.isnan(a):
            assert math.isnan(b), path
        else:
            assert a == pytest.approx(b, rel=1e-12, abs=1e-300), path
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for k, (x, y) in enumerate(zip(a, b)):
            _cmp_vals(x, y, f"{path}[{k}]")
    elif isinstance(a, dict):
        assert set(a) == set(b), path
        for k in a:
            _cmp_vals(a[k], b[k], f"{path}.{k}")
    else:
        assert a == b, path


def assert_engines_agree(pb: ProblemData):
    ps_py = PresolveData(pb)
    st_py = ps_py.presolve()

    ps_nat = PresolveData(pb)
    st_nat = presolve_native(ps_nat)
    assert st_nat is not None

    assert st_py == st_nat
    assert ps_py.rowflag == ps_nat.rowflag
    assert ps_py.colflag == ps_nat.colflag
    assert ps_py.nrow == ps_nat.nrow and ps_py.ncol == ps_nat.ncol
    np.testing.assert_allclose(ps_nat.lrow, ps_py.lrow, rtol=1e-12)
    np.testing.assert_allclose(ps_nat.urow, ps_py.urow, rtol=1e-12)
    np.testing.assert_allclose(ps_nat.lcol, ps_py.lcol, rtol=1e-12)
    np.testing.assert_allclose(ps_nat.ucol, ps_py.ucol, rtol=1e-12)
    np.testing.assert_allclose(ps_nat.obj, ps_py.obj, rtol=1e-12)
    assert ps_nat.obj0 == pytest.approx(ps_py.obj0, rel=1e-12)

    assert len(ps_py.ops) == len(ps_nat.ops)
    for k, (a, b) in enumerate(zip(ps_py.ops, ps_nat.ops)):
        _cmp_vals(_op_fields(a), _op_fields(b), f"op[{k}]")

    # Certificate / empty-problem solutions.
    sp, sn = ps_py.solution, ps_nat.solution
    assert sp.primal_status == sn.primal_status
    assert sp.dual_status == sn.dual_status
    assert sp.is_primal_ray == sn.is_primal_ray
    assert sp.is_dual_ray == sn.is_dual_ray
    np.testing.assert_allclose(np.asarray(sn.x), np.asarray(sp.x))
    np.testing.assert_allclose(np.asarray(sn.y_lower), np.asarray(sp.y_lower))
    np.testing.assert_allclose(np.asarray(sn.y_upper), np.asarray(sp.y_upper))
    np.testing.assert_allclose(np.asarray(sn.s_lower), np.asarray(sp.s_lower))
    np.testing.assert_allclose(np.asarray(sn.s_upper), np.asarray(sp.s_upper))

    assert ps_py.old_con_idx == ps_nat.old_con_idx
    assert ps_py.old_var_idx == ps_nat.old_var_idx


@pytest.mark.parametrize("seed", range(120))
def test_fuzz_engines_agree(seed):
    assert_engines_agree(random_lp(seed))


def test_empty_problem_optimal():
    """All rows/cols removable -> OPTIMAL decided in presolve, both engines."""
    pb = ProblemData("empty")
    pb.load(True, [1.0, -2.0], 0.5, ([], [], []),
            [-1.0], [1.0], [0.0, 0.0], [3.0, 3.0])
    assert_engines_agree(pb)
    ps = PresolveData(pb)
    st = presolve_native(ps)
    assert st == 2  # OPTIMAL
    assert ps.solution.z_primal == pytest.approx(0.5 + (-2.0) * 3.0)


def test_infeasible_certificate_matches():
    pb = ProblemData("inf")
    pb.load(True, [1.0], 0.0, ([0], [0], [1.0]),
            [2.0], [3.0], [0.0], [1.0])  # x <= 1 but row needs >= 2
    assert_engines_agree(pb)


def test_unbounded_certificate_matches():
    pb = ProblemData("ubd")
    pb.load(True, [-1.0, 1.0], 0.0, ([0], [1], [1.0]),
            [0.0], [1.0], [0.0, 0.0], [INF, INF])  # empty col 0, c0 < 0
    assert_engines_agree(pb)
