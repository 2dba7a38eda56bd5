"""Resident-executable guard (docs/xla_cpu_executable_crash.md).

A 400-solve heterogeneous stress through ``batch_linprog`` — many
distinct shape buckets across several calls, all in THIS single module so
the conftest module-scoped cache-clearing fixture never helps mid-test —
plus unit coverage of the budget mechanics.
"""

import numpy as np
import pytest

from tulip_tpu.linprog import batch_linprog
from tulip_tpu.utils import bound_live_executables


def _problems(count, seed, size_lo=3, size_hi=120):
    rng = np.random.default_rng(seed)
    out, truths = [], []
    for _ in range(count):
        m = int(rng.integers(size_lo, size_hi))
        n = 2 * m
        A = rng.standard_normal((m, n))
        u = rng.uniform(1.0, 4.0, n)
        x0 = u * rng.uniform(0.2, 0.8, n)
        b = A @ x0
        c = rng.standard_normal(n)
        out.append(dict(c=c, A_eq=A, b_eq=b,
                        bounds=[(0.0, ub) for ub in u]))
        truths.append((A, b, c, u))
    return out, truths


@pytest.mark.slow
def test_heterogeneous_400_solve_stress():
    """400 heterogeneous solves in one process without the conftest
    fixture's between-module cache clearing: bucketing bounds the number
    of compiled programs and the guard bounds their accumulation; no
    crash, and spot-checked objectives match HiGHS."""
    from scipy.optimize import linprog as scipy_linprog

    all_results = []
    spot = []
    for call in range(4):                      # 4 calls x 100 solves
        probs, truths = _problems(100, seed=call)
        res = batch_linprog(probs, dtype="float64")
        assert len(res) == 100
        n_opt = sum(r.success for r in res)
        assert n_opt == 100, f"call {call}: {n_opt}/100 optimal"
        all_results.extend(res)
        spot.append((res[0], truths[0]))

    assert len(all_results) == 400
    for r, (A, b, c, u) in spot:
        ref = scipy_linprog(c, A_eq=A, b_eq=b,
                            bounds=list(zip(np.zeros(len(c)), u)),
                            method="highs")
        assert ref.status == 0
        assert abs(r.fun - ref.fun) <= 1e-6 * max(1.0, abs(ref.fun))


def test_guard_budget_mechanics(monkeypatch):
    import tulip_tpu.utils as U

    monkeypatch.setenv("TULIP_MAX_LIVE_EXECUTABLES", "4")
    monkeypatch.setattr(U, "_exec_budget_used", 0)
    cleared = [bound_live_executables(1) for _ in range(9)]
    # Budget 4: clears on the 4th and 8th report, counter resets between.
    assert cleared == [False, False, False, True,
                       False, False, False, True, False]


def test_guard_fires_through_batch_linprog(monkeypatch):
    """With a tiny budget, the bucket loop itself trips the guard (the
    solves still return correct results after cache clearing)."""
    import tulip_tpu.utils as U

    monkeypatch.setenv("TULIP_MAX_LIVE_EXECUTABLES", "2")
    monkeypatch.setattr(U, "_exec_budget_used", 0)
    probs, _ = _problems(24, seed=9, size_lo=3, size_hi=90)
    res = batch_linprog(probs, dtype="float64")
    assert all(r.success for r in res)
    # At least one clear happened: the counter wrapped below the budget.
    assert U._exec_budget_used < 2
