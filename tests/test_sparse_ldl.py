"""Tiled sparse K2 (block LDLᵀ) backend tests.

Covers the reference's CHOLMOD-on-K2 workhorse role (reference:
src/KKT/Cholmod/sqd.jl:42-53, default dispatch src/KKT/KKT.jl:134-141):
dense columns of A are the case where K1 = AΘAᵀ fills completely and the
augmented system is the only structure-preserving option.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from tulip_tpu.kkt import SparseK2Backend, make_backend  # noqa: E402
from tulip_tpu.kkt.dense_ldl import DenseK2State  # noqa: E402
from tulip_tpu.kkt.sparse_ldl import SparseK2State, k2_tile_plan  # noqa: E402
from tulip_tpu.kkt.testkit import run_ls_tests  # noqa: E402


def _staircase_dense_col(m=96, n=160, stage=16, ncols_dense=1, seed=0):
    """Staircase A with ``ncols_dense`` fully-dense columns."""
    rng = np.random.default_rng(seed)
    A = np.zeros((m, n))
    nstages = m // stage
    w = min(2 * stage + 8, n)
    cstride = max((n - w) // max(nstages - 1, 1), 1)
    for s in range(nstages):
        c0 = min(s * cstride, n - w)
        A[s * stage:(s + 1) * stage, c0:c0 + w] = \
            rng.standard_normal((stage, w))
    for k in range(ncols_dense):
        A[:, 7 + 11 * k] = rng.standard_normal(m)
    return A


def test_k2_plan_defers_dense_nodes():
    """A dense column's K2 node is ordered last so its fill stays in the
    trailing tiles; the plan is genuinely sparse."""
    A = _staircase_dense_col()
    m, n = A.shape
    plan = k2_tile_plan(A, 16)
    assert plan is not None
    N = n + m
    nbr = plan["nbr"]
    dense_tiles = nbr * (nbr + 1) // 2
    assert plan["ntiles"] < 0.5 * dense_tiles
    # The dense column (index 7) is an x node with ~m neighbours; it must
    # sit in the last block of the permutation.
    pos = int(np.flatnonzero(plan["perm"] == 7)[0])
    assert pos >= N - 16


def test_k2_plan_no_advantage_falls_back():
    """A dense A gives no tiling advantage: setup returns the dense K2
    state and the full contract still holds through the dispatch."""
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal((24, 40)))
    be = SparseK2Backend(block=8, refinement_steps=0)
    assert isinstance(be.setup(A), DenseK2State)
    run_ls_tests(A, be)


def test_k2_tiled_conformance_unit():
    """Tiled path passes the shared augmented-system conformance kit."""
    A = jnp.asarray(_staircase_dense_col())
    be = SparseK2Backend(block=16, refinement_steps=1)
    st = be.setup(A)
    assert isinstance(st, SparseK2State)
    run_ls_tests(A, be)


@pytest.mark.parametrize("inv_factor", [True, False])
def test_k2_tiled_illconditioned_theta(inv_factor):
    """Late-IPM θ spans (1e-6..1e6) still solve to ~1e-8 residuals with
    refinement — the regime where K1's κ(K1)=κ(K2)² hurts most — in both
    the TRSM and the triangular-inverse (GEMM fast-path) modes."""
    rng = np.random.default_rng(1)
    A_np = _staircase_dense_col(seed=1)
    m, n = A_np.shape
    A = jnp.asarray(A_np)
    be = SparseK2Backend(block=16, refinement_steps=2,
                         inv_factor=inv_factor)
    st = be.setup(A)
    th = jnp.asarray(10.0 ** rng.uniform(-6, 6, n))
    regP = jnp.full(n, 1e-8)
    regD = jnp.full(m, 1e-8)
    st, ok = be.update(st, th, regP, regD)
    assert bool(ok)
    xi_p = jnp.asarray(rng.standard_normal(m))
    xi_d = jnp.asarray(rng.standard_normal(n))
    dx, dy = be.solve(st, xi_p, xi_d)
    rd = np.asarray(xi_d) - (-(np.asarray(th) + 1e-8) * np.asarray(dx)
                             + A_np.T @ np.asarray(dy))
    rp = np.asarray(xi_p) - (A_np @ np.asarray(dx) + 1e-8 * np.asarray(dy))
    assert np.max(np.abs(rd)) < 1e-7
    assert np.max(np.abs(rp)) < 1e-7


def test_k2_matches_dense_ldl():
    """Tiled block LDLᵀ agrees with the dense K2 backend on the same
    system (same semantics, different factorization)."""
    rng = np.random.default_rng(2)
    A_np = _staircase_dense_col(m=48, n=80, stage=8, seed=2)
    m, n = A_np.shape
    A = jnp.asarray(A_np)
    th = jnp.asarray(10.0 ** rng.uniform(-2, 2, n))
    regP = jnp.full(n, 1e-6)
    regD = jnp.full(m, 1e-6)
    xi_p = jnp.asarray(rng.standard_normal(m))
    xi_d = jnp.asarray(rng.standard_normal(n))

    def solve(be):
        st = be.setup(A)
        st, ok = be.update(st, th, regP, regD)
        assert bool(ok)
        return be.solve(st, xi_p, xi_d)

    dx1, dy1 = solve(SparseK2Backend(block=8, refinement_steps=1))
    dx1b, dy1b = solve(SparseK2Backend(block=8, refinement_steps=1,
                                       inv_factor=False))
    dx2, dy2 = solve(make_backend("dense-ldl", refinement_steps=1))
    np.testing.assert_allclose(np.asarray(dx1b), np.asarray(dx2),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dy1), np.asarray(dy2),
                               rtol=1e-6, atol=1e-8)


def _dense_col_lp(seed=5):
    """Staircase LP with a dense linking column."""
    rng = np.random.default_rng(seed)
    stages, mr, nc = 10, 6, 9
    m = stages * mr
    n = stages * nc + nc
    A = np.zeros((m, n))
    for s in range(stages):
        A[s * mr:(s + 1) * mr, s * nc:(s + 2) * nc] = \
            rng.standard_normal((mr, 2 * nc))
    A[:, 4] = rng.standard_normal(m)        # dense linking column
    u = rng.uniform(1, 3, n)
    x0 = u * rng.uniform(0.3, 0.7, n)
    b = A @ x0
    c = rng.standard_normal(n)
    return A, b, c, u


def test_smw_split_conformance():
    """SMW splitting backend: split path engages on a dense column and
    passes the shared conformance kit; no dense column → dense fallback
    state through the same dispatch."""
    from tulip_tpu.kkt.dense import DenseK1State
    from tulip_tpu.kkt.splitting import SplitK1Backend, SplitK1State

    A = jnp.asarray(_staircase_dense_col(m=192, n=320))
    be = SplitK1Backend(block=16, refinement_steps=1)
    st = be.setup(A)
    assert isinstance(st, SplitK1State)
    assert st.U.shape[1] == 1
    run_ls_tests(A, be)

    A2 = jnp.asarray(_staircase_dense_col(ncols_dense=0))
    assert isinstance(be.setup(A2), DenseK1State)
    run_ls_tests(A2, be)


def test_smw_split_late_ipm_stress():
    """SMW over all-SPD Cholesky pieces keeps ~1e-11 residuals at Θ spans
    of 1e±10 with the reg floors — the regime where unpivoted block LDLᵀ
    of the mixed K2 loses all accuracy."""
    from tulip_tpu.kkt.splitting import SplitK1Backend

    rng = np.random.default_rng(7)
    A_np = _staircase_dense_col(m=192, n=320, seed=1)
    m, n = A_np.shape
    A = jnp.asarray(A_np)
    be = SplitK1Backend(block=16, refinement_steps=2)
    st = be.setup(A)
    from tulip_tpu.kkt.splitting import SplitK1State
    assert isinstance(st, SplitK1State)
    th = jnp.asarray(10.0 ** rng.uniform(-10, 10, n))
    st, ok = be.update(st, th, jnp.full(n, 1.5e-8), jnp.full(m, 1.5e-8))
    assert bool(ok)
    xi_p = jnp.asarray(rng.standard_normal(m))
    xi_d = jnp.asarray(rng.standard_normal(n))
    dx, dy = be.solve(st, xi_p, xi_d)
    rd = np.asarray(xi_d) - (-(np.asarray(th) + 1.5e-8) * np.asarray(dx)
                             + A_np.T @ np.asarray(dy))
    rp = np.asarray(xi_p) - (A_np @ np.asarray(dx)
                             + 1.5e-8 * np.asarray(dy))
    assert np.max(np.abs(rd)) < 1e-8
    assert np.max(np.abs(rp)) < 1e-8


@pytest.mark.parametrize(
    "algo", ["hsd", pytest.param("mpc", marks=pytest.mark.slow)])
def test_smw_end_to_end_dense_column_lp(algo):
    """Full solve through the SMW splitting backend on a staircase LP
    with a dense linking column, objective vs HiGHS to 1e-8 — under both
    IPM algorithms (MPC exercises the eager-init path for host-symbolic
    backends)."""
    from scipy.optimize import linprog

    from tulip_tpu.ipm.data import make_lp_data
    from tulip_tpu.ipm.hsd import HSDOptions, hsd_solve
    from tulip_tpu.ipm.mpc import MPCOptions, mpc_solve
    from tulip_tpu.kkt.splitting import SplitK1Backend, SplitK1State

    A, b, c, u = _dense_col_lp()
    n = A.shape[1]
    dat = make_lp_data(A, b, c, 0.0, np.zeros(n), u)
    be = SplitK1Backend(block=8, refinement_steps=2)
    assert isinstance(be.setup(jnp.asarray(A)), SplitK1State)
    if algo == "hsd":
        out = hsd_solve(dat, be, HSDOptions())
    else:
        out = mpc_solve(dat, be, MPCOptions())
    assert int(out.status) == 2
    r = linprog(c, A_eq=A, b_eq=b, bounds=list(zip(np.zeros(n), u)),
                method="highs")
    assert r.status == 0
    assert abs(float(out.pobj) - r.fun) < 1e-7 * max(1, abs(r.fun))


def test_probe_routes_dense_columns_to_k2():
    """The model auto-probe detects dense columns and picks sparse-ldl;
    without them it keeps the K1 choices."""
    from tulip_tpu.model import _probe_structure

    rng = np.random.default_rng(0)
    mr, nc, stages = 64, 96, 32          # bench_sparse.py staircase shape
    m, n = stages * mr, stages * nc + nc
    B = np.zeros((m, n))
    for s in range(stages):
        B[s * mr:(s + 1) * mr, s * nc:(s + 2) * nc] = \
            rng.standard_normal((mr, 2 * nc))
    assert _probe_structure(B) in ("banded", "sparse")

    A = B.copy()
    A[:, 7] = rng.standard_normal(m)     # global linking column
    assert _probe_structure(A) == "sparse-smw"


def test_make_backend_sparse_ldl_and_smw():
    import warnings

    from tulip_tpu.kkt.splitting import SplitK1Backend

    # sparse-ldl is a validated production backend (the signed blocked
    # Cholesky replaced the explicit pivot-block inverses that used to
    # stall real IPM trajectories): no experimental warning.
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        be = make_backend("sparse-ldl", system="K2", refinement_steps=1)
    assert isinstance(be, SparseK2Backend)
    with pytest.raises(ValueError):
        make_backend("sparse-ldl", system="K1")
    with pytest.warns(UserWarning, match="experimental"):
        make_backend("tricg")

    be = make_backend("sparse-smw", system="K1", refinement_steps=2)
    assert isinstance(be, SplitK1Backend)


@pytest.mark.parametrize(
    "algo", ["hsd", pytest.param("mpc", marks=pytest.mark.slow)])
def test_sparse_ldl_end_to_end_dense_column_lp(algo):
    """Full IPM solve through the tiled K2 signed blocked Cholesky on a
    staircase LP with a dense linking column, objective vs HiGHS to 1e-8.

    This is the regression test for the backend's promotion out of
    experimental status: the earlier explicit-pivot-block-inverse design
    stalled both algorithms at ~1e-4 gaps on exactly this family."""
    from scipy.optimize import linprog

    from tulip_tpu.ipm.data import make_lp_data
    from tulip_tpu.ipm.hsd import HSDOptions, hsd_solve
    from tulip_tpu.ipm.mpc import MPCOptions, mpc_solve

    A, b, c, u = _dense_col_lp()
    n = A.shape[1]
    dat = make_lp_data(A, b, c, 0.0, np.zeros(n), u)
    be = SparseK2Backend(block=8, refinement_steps=2)
    assert isinstance(be.setup(jnp.asarray(A)), SparseK2State)
    if algo == "hsd":
        out = hsd_solve(dat, be, HSDOptions())
    else:
        out = mpc_solve(dat, be, MPCOptions())
    assert int(out.status) == 2
    r = linprog(c, A_eq=A, b_eq=b, bounds=list(zip(np.zeros(n), u)),
                method="highs")
    assert r.status == 0
    assert abs(float(out.pobj) - r.fun) < 1e-7 * max(1, abs(r.fun))


def test_k2_tiled_f32():
    """f32 path: conformance kit at f32 tolerance, plus a moderate-span
    Θ stress with refinement (the arithmetic axis the reference covers
    with its Float32 CI leg, test/runtests.jl:9)."""
    A_np = _staircase_dense_col(seed=3).astype(np.float32)
    A = jnp.asarray(A_np, dtype=jnp.float32)
    be = SparseK2Backend(block=16, refinement_steps=2)
    st = be.setup(A)
    assert isinstance(st, SparseK2State)
    assert st.T0.dtype == jnp.float32
    run_ls_tests(A, be)

    rng = np.random.default_rng(4)
    m, n = A_np.shape
    th = jnp.asarray(10.0 ** rng.uniform(-2, 2, n), jnp.float32)
    st, ok = be.update(st, th, jnp.full(n, 1e-5, jnp.float32),
                       jnp.full(m, 1e-5, jnp.float32))
    assert bool(ok)
    xi_p = jnp.asarray(rng.standard_normal(m), jnp.float32)
    xi_d = jnp.asarray(rng.standard_normal(n), jnp.float32)
    dx, dy = be.solve(st, xi_p, xi_d)
    rd = np.asarray(xi_d) - (-(np.asarray(th) + 1e-5) * np.asarray(dx)
                             + A_np.T @ np.asarray(dy))
    rp = np.asarray(xi_p) - (A_np @ np.asarray(dx) + 1e-5 * np.asarray(dy))
    assert np.max(np.abs(rd)) < 5e-4
    assert np.max(np.abs(rp)) < 5e-4
