"""XL randomized differential battery (slow tier) — the cheap substitute
for MOI.Test.runtests breadth (VERDICT r4 item 4; reference:
/root/reference/test/Interfaces/MOI_wrapper.jl:24-92 runs thousands of
upstream assertions in four configs).

≥300 random general-bound LPs cross-validated against HiGHS across
{HSD, MPC} × {presolve on/off} × {f64 @1e-8, f32 @3e-4}, plus an MPS
write→read round-trip randomization and a batch-vs-sequential
consistency fuzz through batch_linprog."""

import os
import tempfile

import numpy as np
import pytest

import tulip_tpu as tlp
from tulip_tpu.status import TerminationStatus

from test_fuzz import (random_general_lp, scipy_status_obj,
                       verify_dual_ray, verify_primal_ray)

pytestmark = pytest.mark.slow

# (algo, presolve_level, dtype, ipm_tol, obj_rtol). 6 configs × 60 LPs
# (seeded deterministically per config) = 360 instances.
CONFIGS = [
    ("HSD", 1, "float64", None, 1e-6),
    ("HSD", 0, "float64", None, 1e-6),
    ("MPC", 1, "float64", None, 1e-6),
    ("MPC", 0, "float64", None, 1e-6),
    ("HSD", 1, "float32", 3e-4, 5e-3),
    ("MPC", 1, "float32", 3e-4, 5e-3),
]
N_PER_CONFIG = 60


def _configure(m, algo, presolve, dtype, tol):
    m.params.IPM.Algorithm = algo
    m.params.Presolve.Level = presolve
    m.params.ArithmeticDtype = dtype
    if tol is not None:
        for f in ("TolerancePFeas", "ToleranceDFeas",
                  "ToleranceRGap", "ToleranceIFeas"):
            setattr(m.params.IPM, f, tol)


@pytest.mark.parametrize("algo,presolve,dtype,tol,rtol", CONFIGS,
                         ids=[f"{a}-ps{p}-{d[-2:]}"
                              for a, p, d, *_ in CONFIGS])
def test_fuzz_xl(algo, presolve, dtype, tol, rtol):
    import jax
    import zlib

    # Random shapes × 6 configs accumulate hundreds of XLA:CPU
    # executables; past ~300 live executables that state has produced
    # hard SIGSEGVs in later compiles (docs/xla_cpu_executable_crash.md).
    # The module-scope conftest fixture clears between modules; this
    # battery must also clear between configs.
    jax.clear_caches()
    # zlib.crc32, NOT hash(): str hashing is randomized per process, which
    # made the battery generate different LPs per run (observed flake).
    rng = np.random.default_rng(
        zlib.crc32(f"{algo}-{presolve}-{dtype}".encode()))
    checked = 0
    skipped = 0
    for trial in range(N_PER_CONFIG):
        m = random_general_lp(rng)
        ref_status, ref_obj = scipy_status_obj(m)
        if ref_status == "other":
            skipped += 1
            continue
        _configure(m, algo, presolve, dtype, tol)
        # Ray verification at the same gate the model's validator uses
        # for this dtype/tolerance (f32 @3e-4 certifies rays to ~1e-2).
        from tulip_tpu.model import _certificate_tol
        ray_tol = _certificate_tol(m.params)
        st = m.optimize()
        if ref_status == "optimal":
            # f32 on a near-degenerate instance may legitimately stop at
            # ITERATION_LIMIT; everything else must close the case.
            if dtype == "float32" and st == TerminationStatus.ITERATION_LIMIT:
                skipped += 1
                continue
            assert st == TerminationStatus.OPTIMAL, (algo, presolve,
                                                     dtype, trial, st)
            z = tlp.get_attribute(m, "ObjectiveValue")
            assert abs(z - ref_obj) <= rtol * max(1.0, abs(ref_obj)), (
                algo, presolve, dtype, trial, z, ref_obj)
        elif ref_status == "infeasible":
            ok_statuses = (TerminationStatus.PRIMAL_INFEASIBLE,
                           TerminationStatus.DUAL_INFEASIBLE,
                           TerminationStatus.PRIMAL_DUAL_INFEASIBLE)
            if dtype == "float32" and st in (
                    TerminationStatus.ITERATION_LIMIT,
                    TerminationStatus.NUMERICAL_PROBLEM):
                # At 3e-4 f32, certificate detection on near-degenerate
                # infeasible instances is precision-limited; an honest
                # numerical-failure report is acceptable, a wrong OPTIMAL
                # is not.
                skipped += 1
                continue
            # MPC's infeasibility detection is weaker than HSD's
            # (reference: MPC.jl:185-208) — NUMERICAL_PROBLEM or
            # ITERATION_LIMIT on an infeasible LP is reference-parity
            # behavior, not a wrong answer.
            if algo == "MPC" and st not in ok_statuses:
                assert st in (TerminationStatus.NUMERICAL_PROBLEM,
                              TerminationStatus.ITERATION_LIMIT), (
                    algo, presolve, dtype, trial, st)
                skipped += 1
                continue
            assert st in ok_statuses, (algo, presolve, dtype, trial, st)
            if m.solution.is_dual_ray:
                assert verify_dual_ray(m.pbdata, m.solution, tol=ray_tol), (
                    algo, presolve, dtype, trial)
            if m.solution.is_primal_ray:
                assert verify_primal_ray(m.pbdata, m.solution, tol=ray_tol), (
                    algo, presolve, dtype, trial)
        else:  # unbounded
            if dtype == "float32" and st == TerminationStatus.ITERATION_LIMIT:
                skipped += 1
                continue
            if algo == "MPC" and st not in (
                    TerminationStatus.DUAL_INFEASIBLE,):
                assert st in (TerminationStatus.NUMERICAL_PROBLEM,
                              TerminationStatus.ITERATION_LIMIT), (
                    algo, presolve, dtype, trial, st)
                skipped += 1
                continue
            assert st == TerminationStatus.DUAL_INFEASIBLE, (
                algo, presolve, dtype, trial, st)
            if m.solution.is_primal_ray:
                assert verify_primal_ray(m.pbdata, m.solution, tol=ray_tol), (
                    algo, presolve, dtype, trial)
        checked += 1
    # The battery must actually exercise the solver, not skip its way
    # through.
    assert checked >= 0.6 * N_PER_CONFIG, (checked, skipped)


def test_fuzz_mps_roundtrip():
    """Random LPs survive MPS write→read: same status and objective."""
    from tulip_tpu.io.mps import write_mps

    rng = np.random.default_rng(77)
    checked = 0
    for trial in range(60):
        m = random_general_lp(rng)
        # Box every variable so most instances are bounded-optimal (the
        # general generator at this size is unbounded ~2/3 of the time;
        # status coverage for rays lives in test_fuzz_xl above).
        pb = m.pbdata
        for j in range(pb.nvar):
            if not np.isfinite(pb.lvar[j]):
                pb.lvar[j] = -3.0
            if not np.isfinite(pb.uvar[j]):
                pb.uvar[j] = 3.0
        ref_status, ref_obj = scipy_status_obj(m)
        if ref_status != "optimal":
            continue
        st1 = m.optimize()
        z1 = tlp.get_attribute(m, "ObjectiveValue")
        with tempfile.TemporaryDirectory() as td:
            fname = os.path.join(td, "rt.mps")
            write_mps(m.pbdata, fname)
            m2 = tlp.Model()
            tlp.load_problem(m2, fname)
            st2 = m2.optimize()
        assert st2 == st1, trial
        z2 = tlp.get_attribute(m2, "ObjectiveValue")
        assert abs(z2 - z1) <= 1e-6 * max(1.0, abs(z1)), (trial, z1, z2)
        checked += 1
    assert checked >= 15, checked


def test_fuzz_batch_vs_sequential():
    """batch_linprog agrees with per-instance linprog on a random batch
    (statuses and objectives) — the DP scaling axis must not change
    answers."""
    from tulip_tpu.linprog import batch_linprog, linprog

    rng = np.random.default_rng(99)
    problems = []
    for _ in range(24):
        m_ = int(rng.integers(2, 6))
        n_ = int(rng.integers(2, 9))
        A = rng.standard_normal((m_, n_))
        u = rng.uniform(0.5, 3.0, n_)
        x0 = u * rng.uniform(0.2, 0.8, n_)
        problems.append(dict(
            c=rng.standard_normal(n_),
            A_ub=A, b_ub=A @ x0 + rng.uniform(0.1, 1.0, m_),
            bounds=[(0.0, float(ub)) for ub in u],
        ))
    batch = batch_linprog(problems, dtype="float64")
    for i, prob in enumerate(problems):
        seq = linprog(**prob)
        assert batch[i].status == seq.status, i
        if seq.success:
            assert abs(batch[i].fun - seq.fun) <= \
                1e-6 * max(1.0, abs(seq.fun)), (i, batch[i].fun, seq.fun)
