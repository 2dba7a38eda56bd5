"""Batched (vmap) solver tests — no reference analogue (SURVEY §4: batched
tests must be designed fresh): per-instance convergence, agreement with
single solves and with scipy's HiGHS, and sharding over a device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tulip_tpu  # noqa: F401
from tulip_tpu.ipm.batch import batched_hsd_solve, pad_lp, shard_batch, stack_lps
from tulip_tpu.ipm.data import make_lp_data
from tulip_tpu.ipm.hsd import HSDOptions, hsd_solve
from tulip_tpu.kkt import DenseK1Backend
from tulip_tpu.status import TerminationStatus

OPT = int(TerminationStatus.OPTIMAL)


def random_feasible_lp(rng, m=6, n=12, dtype=np.float64):
    """Random standard-form LP with known-feasible interior: A random,
    b = A x0 for x0 in the interior of [0, u]."""
    A = rng.standard_normal((m, n))
    u = rng.uniform(1.0, 4.0, n)
    x0 = u * rng.uniform(0.2, 0.8, n)
    b = A @ x0
    c = rng.standard_normal(n)
    return make_lp_data(A, b, c, 0.0, l=np.zeros(n), u=u,
                        dtype=dtype), (A, b, c, u)


def scipy_objective(A, b, c, u):
    from scipy.optimize import linprog
    r = linprog(c, A_eq=A, b_eq=b, bounds=[(0, ub) for ub in u],
                method="highs")
    assert r.status == 0
    return r.fun


def test_batch_matches_single_and_scipy():
    rng = np.random.default_rng(42)
    lps, raws = zip(*[random_feasible_lp(rng) for _ in range(8)])
    dats = stack_lps(list(lps))
    backend = DenseK1Backend()
    opts = HSDOptions()
    out = batched_hsd_solve(backend, opts, dats)

    assert np.all(np.asarray(out.status) == OPT)
    for k in range(8):
        z_scipy = scipy_objective(*raws[k])
        assert abs(float(out.pobj[k]) - z_scipy) < 1e-7 * max(1, abs(z_scipy))
        # Batched result equals the single solve.
        single = hsd_solve(lps[k], backend, opts)
        assert abs(float(out.pobj[k]) - float(single.pobj)) < 1e-7


def test_batch_mixed_shapes_padding():
    rng = np.random.default_rng(7)
    lp1, raw1 = random_feasible_lp(rng, m=4, n=9)
    lp2, raw2 = random_feasible_lp(rng, m=6, n=12)
    dats = stack_lps([lp1, lp2])
    out = batched_hsd_solve(DenseK1Backend(), HSDOptions(), dats)
    assert np.all(np.asarray(out.status) == OPT)
    for k, raw in enumerate([raw1, raw2]):
        z = scipy_objective(*raw)
        assert abs(float(out.pobj[k]) - z) < 1e-7 * max(1, abs(z))


def test_pad_preserves_solution():
    rng = np.random.default_rng(3)
    lp, raw = random_feasible_lp(rng)
    padded = pad_lp(lp, lp.nrow + 3, lp.ncol + 5)
    out = hsd_solve(padded, DenseK1Backend(), HSDOptions())
    assert int(out.status) == OPT
    z = scipy_objective(*raw)
    assert abs(float(out.pobj) - z) < 1e-7 * max(1, abs(z))


def test_batch_sharded_over_mesh():
    """Batch axis sharded over an 8-device CPU mesh."""
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(devs[:8]), ("batch",))

    rng = np.random.default_rng(0)
    lps, raws = zip(*[random_feasible_lp(rng) for _ in range(8)])
    dats = shard_batch(stack_lps(list(lps)), mesh)
    out = batched_hsd_solve(DenseK1Backend(), HSDOptions(), dats)
    assert np.all(np.asarray(out.status) == OPT)
    for k in range(8):
        z = scipy_objective(*raws[k])
        assert abs(float(out.pobj[k]) - z) < 1e-7 * max(1, abs(z))


def test_batch_heterogeneous_statuses():
    """A batch mixing optimal / infeasible / unbounded instances must
    resolve each lane independently."""
    dt = np.float64
    # Optimal: min x1+2x2; x1+x2=1; x1-x2=0; 0<=x<=1.
    opt = make_lp_data([[1, 1], [1, -1]], [1, 0], [1, 2], 0.0,
                       [0, 0], [1, 1], dtype=dt)
    # Infeasible: x1+x2=1; x1-x2=3; 0<=x<=1 (needs x1=2 > u).
    inf = make_lp_data([[1, 1], [1, -1]], [1, 3], [1, 1], 0.0,
                       [0, 0], [1, 1], dtype=dt)
    # Unbounded: min -x1-x2 st x1-x2=1, x>=0 — pad x with huge bounds off.
    ubd = make_lp_data([[1, -1], [0, 0]], [1, 0], [-1, -1], 0.0,
                       [0, 0], [np.inf, np.inf], dtype=dt)
    dats = stack_lps([opt, inf, ubd])
    out = batched_hsd_solve(DenseK1Backend(), HSDOptions(), dats)
    st = np.asarray(out.status)
    assert st[0] == OPT
    assert st[1] == int(TerminationStatus.PRIMAL_INFEASIBLE)
    assert st[2] == int(TerminationStatus.DUAL_INFEASIBLE)


def test_batched_mpc_matches_scipy():
    from tulip_tpu.ipm.batch import batched_mpc_solve
    from tulip_tpu.ipm.mpc import MPCOptions

    rng = np.random.default_rng(21)
    lps, raws = zip(*[random_feasible_lp(rng) for _ in range(6)])
    out = batched_mpc_solve(DenseK1Backend(), MPCOptions(),
                            stack_lps(list(lps)))
    assert np.all(np.asarray(out.status) == OPT)
    for k in range(6):
        z = scipy_objective(*raws[k])
        assert abs(float(out.pobj[k]) - z) < 1e-7 * max(1, abs(z))


def test_warm_start_reduces_iterations():
    """Warm-started re-solve of a perturbed LP converges in fewer
    iterations than cold start, to the same objective (capability beyond
    the reference, which lists warm starts as future work)."""
    from tulip_tpu.ipm.hsd import hsd_solve_device, init_state
    from tulip_tpu.ipm.warmstart import warm_state

    rng = np.random.default_rng(0)
    lp, (A, b, c, u) = random_feasible_lp(rng, m=10, n=20)
    be = DenseK1Backend()
    opts = HSDOptions()
    out0 = hsd_solve_device(be, opts, lp, init_state(lp, be))
    assert int(out0.status) == OPT

    b2 = b * (1 + 0.005 * rng.standard_normal(len(b)))
    lp2 = make_lp_data(A, b2, c, 0.0, np.zeros(len(c)), u)
    cold = hsd_solve_device(be, opts, lp2, init_state(lp2, be))
    warm = hsd_solve_device(be, opts, lp2, warm_state(lp2, be, out0))
    assert int(cold.status) == OPT and int(warm.status) == OPT
    assert abs(float(cold.pobj) - float(warm.pobj)) < 1e-6
    assert int(warm.niter) <= int(cold.niter)


def test_batch_linprog_heterogeneous():
    """High-level batched entry: mixed-shape instances in one device
    program, objective parity with HiGHS, per-lane statuses."""
    from scipy.optimize import linprog as slp

    import tulip_tpu as tlp

    rng = np.random.default_rng(0)
    probs, refs = [], []
    for _ in range(6):
        m, n = int(rng.integers(4, 10)), int(rng.integers(10, 20))
        A = rng.standard_normal((m, n))
        u = rng.uniform(1, 4, n)
        x0 = u * rng.uniform(0.2, 0.8, n)
        b = A @ x0
        c = rng.standard_normal(n)
        bounds = list(zip(np.zeros(n), u))
        probs.append(dict(c=c, A_eq=A, b_eq=b, bounds=bounds))
        refs.append(slp(c, A_eq=A, b_eq=b, bounds=bounds, method="highs"))
    probs.append(dict(c=[1.0], A_eq=[[1.0]], b_eq=[5.0],
                      bounds=[(0.0, 1.0)]))  # infeasible lane

    res = tlp.batch_linprog(probs, dtype="float64")
    for r, ref in zip(res[:-1], refs):
        assert r.success
        assert abs(r.fun - ref.fun) < 1e-6 * max(1.0, abs(ref.fun))
        np.testing.assert_allclose(r.x, ref.x, atol=1e-5)
    assert res[-1].status == 2 and not res[-1].success


def test_batch_linprog_mpc():
    """The batched entry also runs the MPC algorithm."""
    from scipy.optimize import linprog as slp

    import tulip_tpu as tlp

    rng = np.random.default_rng(3)
    m, n = 6, 12
    A = rng.standard_normal((m, n))
    u = rng.uniform(1, 4, n)
    x0 = u * rng.uniform(0.2, 0.8, n)
    b = A @ x0
    c = rng.standard_normal(n)
    bounds = list(zip(np.zeros(n), u))
    ref = slp(c, A_eq=A, b_eq=b, bounds=bounds, method="highs")
    res = tlp.batch_linprog([dict(c=c, A_eq=A, b_eq=b, bounds=bounds)] * 3,
                            dtype="float64", algorithm="MPC")
    for r in res:
        assert r.success
        assert abs(r.fun - ref.fun) < 1e-6 * max(1.0, abs(ref.fun))


def test_batch_linprog_presolve_paths():
    """Presolve inside the batched entry: decided-by-presolve lanes (bound
    conflict) never reach the device; reduced lanes postsolve back to the
    original space; presolve=False matches."""
    from scipy.optimize import linprog as slp

    import tulip_tpu as tlp

    rng = np.random.default_rng(7)
    m, n = 5, 10
    A = rng.standard_normal((m, n))
    u = rng.uniform(1, 4, n)
    x0 = u * rng.uniform(0.2, 0.8, n)
    b = A @ x0
    c = rng.standard_normal(n)
    bounds = list(zip(np.zeros(n), u))
    # Lane with a fixed variable (l == u) exercising a presolve reduction.
    bounds_fix = list(bounds)
    bounds_fix[3] = (u[3] * 0.5, u[3] * 0.5)
    probs = [
        dict(c=c, A_eq=A, b_eq=b, bounds=bounds),
        dict(c=c, A_eq=A, b_eq=b, bounds=bounds_fix),
        dict(c=[1.0, 1.0], A_eq=[[1.0, 0.0]], b_eq=[5.0],
             bounds=[(0.0, 1.0), (0.0, 1.0)]),   # presolve-decided: infeasible
    ]
    res = tlp.batch_linprog(probs, dtype="float64")
    assert res[2].status == 2 and res[2].nit == 0   # decided on the host
    for k in (0, 1):
        ref = slp(probs[k]["c"], A_eq=probs[k]["A_eq"],
                  b_eq=probs[k]["b_eq"], bounds=probs[k]["bounds"],
                  method="highs")
        assert res[k].success
        assert abs(res[k].fun - ref.fun) < 1e-6 * max(1.0, abs(ref.fun))
        np.testing.assert_allclose(res[k].x, ref.x, atol=1e-5)

    res_np = tlp.batch_linprog(probs[:2], dtype="float64", presolve=False)
    for k in (0, 1):
        assert abs(res_np[k].fun - res[k].fun) < 1e-6


def test_batched_warm_resolve():
    """Warm-started batched re-solve of perturbed instances converges in
    fewer iterations than cold starts and agrees on objectives."""
    import jax.numpy as jnp

    from tulip_tpu.ipm.batch import (batched_hsd_resolve, batched_hsd_solve,
                                     stack_lps)
    from tulip_tpu.ipm.data import make_lp_data
    from tulip_tpu.ipm.hsd import HSDOptions
    from tulip_tpu.kkt import DenseK1Backend

    rng = np.random.default_rng(0)

    def make(perturb):
        rng2 = np.random.default_rng(1)
        lps = []
        for _ in range(8):
            A = rng2.standard_normal((8, 16))
            u = rng2.uniform(1, 4, 16)
            x0 = u * rng2.uniform(0.2, 0.8, 16)
            c = rng2.standard_normal(16)
            b = A @ x0
            if perturb:
                b = b * (1 + 0.01 * rng.standard_normal(8))
            lps.append(make_lp_data(A, b, c, 0.0, np.zeros(16), u))
        return stack_lps(lps)

    be = DenseK1Backend()
    opts = HSDOptions()
    out0 = batched_hsd_solve(be, opts, make(False))
    dats2 = make(True)
    cold = batched_hsd_solve(be, opts, dats2)
    warm = batched_hsd_resolve(be, opts, dats2, out0)
    assert (np.asarray(warm.status) == 2).all()
    assert np.asarray(warm.niter).mean() < np.asarray(cold.niter).mean()
    np.testing.assert_allclose(np.asarray(warm.pobj), np.asarray(cold.pobj),
                               rtol=1e-6, atol=1e-6)


def test_batch_linprog_bucketed_size_skew():
    """Shape bucketing (SURVEY §7 hard-part 5): a size-skewed batch
    (16x32 ... 64x128) groups into pad-to-next-pow2 buckets — the small
    lanes must not be padded to the outlier's envelope — and every lane
    still matches HiGHS."""
    from scipy.optimize import linprog as slp

    import tulip_tpu as tlp
    from tulip_tpu.ipm.batch import bucket_dim

    assert bucket_dim(16) == 16
    assert bucket_dim(17) == 32
    assert bucket_dim(5) == 16
    assert bucket_dim(100) == 128

    rng = np.random.default_rng(3)
    probs, refs = [], []
    for (m, n) in [(16, 32)] * 4 + [(24, 48), (40, 80), (64, 128)]:
        A = rng.standard_normal((m, n))
        u = rng.uniform(1, 4, n)
        x0 = u * rng.uniform(0.2, 0.8, n)
        b = A @ x0
        c = rng.standard_normal(n)
        bounds = list(zip(np.zeros(n), u))
        probs.append(dict(c=c, A_eq=A, b_eq=b, bounds=bounds))
        refs.append(slp(c, A_eq=A, b_eq=b, bounds=bounds, method="highs"))

    res = tlp.batch_linprog(probs, dtype="float64", presolve=False)
    for r, ref in zip(res, refs):
        assert r.success, r.message
        assert abs(r.fun - ref.fun) < 1e-6 * max(1.0, abs(ref.fun))
        np.testing.assert_allclose(r.x, ref.x, atol=1e-5)
