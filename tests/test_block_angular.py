"""Block-angular / distributed-Schur solver tests — no reference analogue
(SURVEY §2.6): correctness vs the dense solver and HiGHS, KKT conformance
of the Schur backend, and sharded execution over the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tulip_tpu  # noqa: F401
from tulip_tpu.ipm.hsd import HSDOptions, hsd_solve, hsd_solve_device
from tulip_tpu.kkt import DenseK1Backend, SchurK1Backend
from tulip_tpu.parallel import (block_angular_to_dense, make_block_angular,
                                shard_scenarios)
from tulip_tpu.status import TerminationStatus

OPT = int(TerminationStatus.OPTIMAL)


def random_two_stage(rng, K=4, m0=3, n0=6, mk=4, nk=8):
    """Random feasible two-stage stochastic LP in standard form."""
    A0 = rng.standard_normal((m0, n0))
    T = rng.standard_normal((K, mk, n0))
    W = rng.standard_normal((K, mk, nk))
    u0 = rng.uniform(1, 3, n0)
    uk = rng.uniform(1, 3, (K, nk))
    x0 = u0 * rng.uniform(0.2, 0.8, n0)
    xs = uk * rng.uniform(0.2, 0.8, (K, nk))
    b0 = A0 @ x0
    h = np.einsum("kij,j->ki", T, x0) + np.einsum("kij,kj->ki", W, xs)
    c0x = rng.standard_normal(n0)
    cks = rng.standard_normal((K, nk))
    l = np.zeros(n0 + K * nk)
    u = np.concatenate([u0, uk.reshape(-1)])
    return make_block_angular(A0, b0, c0x, T, W, h, cks, l, u)


def test_matvec_matches_dense():
    rng = np.random.default_rng(0)
    ba = random_two_stage(rng)
    dense = block_angular_to_dense(ba)
    from tulip_tpu.ipm.data import matvec, rmatvec
    x = rng.standard_normal(ba.ncol)
    y = rng.standard_normal(ba.nrow)
    np.testing.assert_allclose(matvec(ba, x), dense.A @ x, atol=1e-10)
    np.testing.assert_allclose(rmatvec(ba, y), dense.A.T @ y, atol=1e-10)


def test_schur_backend_conformance():
    """Schur backend satisfies the augmented-system contract
    (same check as kkt/testkit.py, structured operator)."""
    rng = np.random.default_rng(1)
    ba = random_two_stage(rng)
    dense = block_angular_to_dense(ba)
    backend = SchurK1Backend()
    st = backend.setup_data(ba)

    n, m = ba.ncol, ba.nrow
    theta_inv = jnp.asarray(10.0 ** rng.uniform(-3, 3, n))
    regP = jnp.full(n, 1e-8)
    regD = jnp.full(m, 1e-8)
    st, ok = backend.update(st, theta_inv, regP, regD)
    assert bool(ok)
    xi_p = jnp.asarray(rng.standard_normal(m))
    xi_d = jnp.asarray(rng.standard_normal(n))
    dx, dy = backend.solve(st, xi_p, xi_d)

    A = np.asarray(dense.A)
    rd = np.asarray(xi_d) - (-(np.asarray(theta_inv) + 1e-8) * np.asarray(dx)
                             + A.T @ np.asarray(dy))
    rp = np.asarray(xi_p) - (A @ np.asarray(dx) + 1e-8 * np.asarray(dy))
    assert np.max(np.abs(rd)) < 1e-6
    assert np.max(np.abs(rp)) < 1e-6


def test_schur_solve_matches_dense_and_highs():
    rng = np.random.default_rng(2)
    ba = random_two_stage(rng)
    dense = block_angular_to_dense(ba)
    opts = HSDOptions()

    out_schur = hsd_solve(ba, SchurK1Backend(), opts)
    out_dense = hsd_solve(dense, DenseK1Backend(), opts)
    assert int(out_schur.status) == OPT
    assert int(out_dense.status) == OPT
    assert abs(float(out_schur.pobj) - float(out_dense.pobj)) < 1e-7

    from scipy.optimize import linprog
    A = np.asarray(dense.A)
    r = linprog(np.asarray(dense.c), A_eq=A, b_eq=np.asarray(dense.b),
                bounds=list(zip(np.asarray(dense.l),
                                np.where(np.asarray(dense.uflag) > 0,
                                         np.asarray(dense.u), np.inf))),
                method="highs")
    assert r.status == 0
    assert abs(float(out_schur.pobj) - r.fun) < 1e-7 * max(1, abs(r.fun))


def test_schur_sharded_over_mesh():
    """Scenario axis sharded over 8 devices; full HSD solve under jit with
    GSPMD-inserted collectives."""
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.array(devs[:8]), ("scen",))

    rng = np.random.default_rng(3)
    ba = random_two_stage(rng, K=8, m0=3, n0=6, mk=4, nk=8)
    ref = hsd_solve(ba, SchurK1Backend(), HSDOptions())
    assert int(ref.status) == OPT

    ba_sharded = shard_scenarios(ba, mesh)
    out = jax.block_until_ready(
        hsd_solve_device(SchurK1Backend(), HSDOptions(), ba_sharded))
    assert int(out.status) == OPT
    assert abs(float(out.pobj) - float(ref.pobj)) < 1e-8


def test_schur_with_refinement_f32():
    rng = np.random.default_rng(4)
    ba = random_two_stage(rng)
    ba32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, ba)
    tol = 3e-4
    opts = HSDOptions(TolerancePFeas=tol, ToleranceDFeas=tol,
                      ToleranceRGap=tol, ToleranceIFeas=tol,
                      PRegMin=1e-6, DRegMin=1e-6)
    out = hsd_solve(ba32, SchurK1Backend(refinement_steps=1), opts)
    assert int(out.status) == OPT
