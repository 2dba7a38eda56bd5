"""Randomized cross-validation against HiGHS: statuses and objectives on
LPs with arbitrary bound structure (free/boxed/one-sided variables, eq/le/
ge/range rows), including infeasible and unbounded instances."""

import numpy as np
import pytest

import tulip_tpu as tlp
from tulip_tpu.problem import INF
from tulip_tpu.status import TerminationStatus


def random_general_lp(rng):
    m_ = int(rng.integers(2, 8))
    n_ = int(rng.integers(2, 12))
    A = rng.standard_normal((m_, n_))
    A[rng.random((m_, n_)) < 0.3] = 0.0
    c = rng.standard_normal(n_)

    pb_bounds = []
    for _ in range(n_):
        kind = rng.integers(0, 4)
        if kind == 0:
            pb_bounds.append((-INF, INF))
        elif kind == 1:
            lo = rng.uniform(-2, 0)
            pb_bounds.append((lo, lo + rng.uniform(0.5, 3)))
        elif kind == 2:
            pb_bounds.append((rng.uniform(-1, 1), INF))
        else:
            pb_bounds.append((-INF, rng.uniform(-1, 1)))

    rows = []
    for i in range(m_):
        b = rng.uniform(-2, 2)
        kind = rng.integers(0, 4)
        if kind == 0:
            rows.append((b, b))
        elif kind == 1:
            rows.append((-INF, b))
        elif kind == 2:
            rows.append((b, INF))
        else:
            rows.append((b, b + rng.uniform(0.5, 2)))

    m = tlp.Model()
    pb = m.pbdata
    for j in range(n_):
        pb.add_variable((), (), c[j], *pb_bounds[j])
    for i in range(m_):
        cols = [j for j in range(n_) if A[i, j] != 0.0]
        if not cols:
            continue
        pb.add_constraint(cols, [A[i, j] for j in cols], *rows[i])
    return m


def scipy_status_obj(m):
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from golden_lps import to_scipy
    from scipy.optimize import linprog

    c, A_ub, b_ub, A_eq, b_eq, bounds, sense = to_scipy(m.pbdata)
    r = linprog(c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
                bounds=bounds, method="highs")
    # scipy: 0 optimal, 2 infeasible, 3 unbounded.
    if r.status == 0:
        return "optimal", sense * r.fun + m.pbdata.obj0
    if r.status == 2:
        return "infeasible", None
    if r.status == 3:
        return "unbounded", None
    return "other", None


def verify_primal_ray(pb, sol, tol=1e-5) -> bool:
    """Unboundedness certificate: direction d in the recession cone with
    negative (min-sense) objective."""
    d = sol.x
    nrm = max(1.0, np.max(np.abs(d)))
    A = pb.to_dense()
    Ad = A @ d
    for i in range(pb.ncon):
        lo, hi = pb.lcon[i], pb.ucon[i]
        if np.isfinite(lo) and Ad[i] < -tol * nrm:
            return False
        if np.isfinite(hi) and Ad[i] > tol * nrm:
            return False
    for j in range(pb.nvar):
        if np.isfinite(pb.lvar[j]) and d[j] < -tol * nrm:
            return False
        if np.isfinite(pb.uvar[j]) and d[j] > tol * nrm:
            return False
    sense = 1.0 if pb.objsense else -1.0
    return sense * float(np.dot(pb.obj, d)) < -tol * nrm


def verify_dual_ray(pb, sol, tol=1e-5) -> bool:
    """Farkas certificate: A'y + s = 0 with sign-feasible (y, s) and
    positive certificate value."""
    y = sol.y_lower - sol.y_upper
    s = sol.s_lower - sol.s_upper
    A = pb.to_dense()
    nrm = max(1.0, np.max(np.abs(y)), np.max(np.abs(s)))
    if np.max(np.abs(A.T @ y + s)) > tol * nrm:
        return False
    val = 0.0
    for i in range(pb.ncon):
        lo, hi = pb.lcon[i], pb.ucon[i]
        if sol.y_lower[i] > tol * nrm and not np.isfinite(lo):
            return False
        if sol.y_upper[i] > tol * nrm and not np.isfinite(hi):
            return False
        val += (sol.y_lower[i] * (lo if np.isfinite(lo) else 0.0)
                - sol.y_upper[i] * (hi if np.isfinite(hi) else 0.0))
    for j in range(pb.nvar):
        lo, hi = pb.lvar[j], pb.uvar[j]
        if sol.s_lower[j] > tol * nrm and not np.isfinite(lo):
            return False
        if sol.s_upper[j] > tol * nrm and not np.isfinite(hi):
            return False
        val += (sol.s_lower[j] * (lo if np.isfinite(lo) else 0.0)
                - sol.s_upper[j] * (hi if np.isfinite(hi) else 0.0))
    return val > tol * nrm


@pytest.mark.parametrize(
    "seed", list(range(3)) + [pytest.param(i, marks=pytest.mark.slow)
                              for i in range(3, 6)])
def test_fuzz_status_classification(seed):
    rng = np.random.default_rng(100 + seed)
    counts = {"optimal": 0, "infeasible": 0, "unbounded": 0}
    for trial in range(8):
        m = random_general_lp(rng)
        ref_status, ref_obj = scipy_status_obj(m)
        if ref_status == "other":
            continue
        st = m.optimize()
        if ref_status == "optimal":
            assert st == TerminationStatus.OPTIMAL, (seed, trial)
            z = tlp.get_attribute(m, "ObjectiveValue")
            assert abs(z - ref_obj) <= 1e-6 * max(1.0, abs(ref_obj)), (
                seed, trial, z, ref_obj)
        elif ref_status == "infeasible":
            # An LP can be primal AND dual infeasible; HSD/presolve may
            # certify either side. Whatever ray IS claimed must verify
            # (the model drops unverifiable claims).
            assert st in (TerminationStatus.PRIMAL_INFEASIBLE,
                          TerminationStatus.DUAL_INFEASIBLE), (seed, trial)
            if m.solution.is_dual_ray:
                assert verify_dual_ray(m.pbdata, m.solution), (seed, trial)
            if m.solution.is_primal_ray:
                assert verify_primal_ray(m.pbdata, m.solution), (seed, trial)
        else:  # unbounded (primal feasible by HiGHS)
            assert st == TerminationStatus.DUAL_INFEASIBLE, (seed, trial)
            if m.solution.is_primal_ray:
                assert verify_primal_ray(m.pbdata, m.solution), (seed, trial)
        counts[ref_status] += 1
    # The generator should exercise at least two categories per seed.
    assert sum(1 for v in counts.values() if v > 0) >= 2, counts
