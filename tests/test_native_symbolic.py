"""Native C++ symbolic-analysis engine (native/symbolic.cpp via
tulip_tpu/kkt/native.py): RCM ordering and tile-plan schedule emission,
checked against the pure-Python/scipy reference implementations and
through the in-package KKT conformance kit."""

import numpy as np
import pytest

from tulip_tpu.kkt.native import native_available, rcm_native, tile_plan_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native symbolic library unavailable")


def staircase(m=96, n=160, bw0=8, seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((m, n))
    for i in range(m):
        lo = min(max(0, i * 2 - bw0), n - 2 * bw0)
        A[i, lo:lo + 2 * bw0] = rng.standard_normal(2 * bw0)
    return A


def block_angular(nb=6, bs=32, seed=0):
    """Chain-coupled block-diagonal LP (two-stage-like): nb diagonal
    blocks plus one narrow linking row per adjacent pair."""
    rng = np.random.default_rng(seed)
    m, n = nb * bs + (nb - 1), nb * bs * 2
    A = np.zeros((m, n))
    for k in range(nb):
        A[k * bs:(k + 1) * bs, k * bs * 2:(k + 1) * bs * 2] = \
            rng.standard_normal((bs, bs * 2))
    for k in range(nb - 1):
        r = nb * bs + k
        A[r, (k + 1) * bs * 2 - 4:(k + 1) * bs * 2 + 4] = \
            rng.standard_normal(8)
    return A


def test_rcm_matches_scipy_bandwidth():
    """Native RCM is a valid permutation whose bandwidth is within 25% of
    scipy's (exact ties on banded inputs)."""
    from tulip_tpu.kkt.banded import rcm_bandwidth

    A = staircase()
    perm, bw = rcm_native(A)
    assert sorted(perm.tolist()) == list(range(A.shape[0]))
    _, bw_scipy = rcm_bandwidth(A, use_native=False)
    assert bw <= max(bw_scipy * 1.25, bw_scipy + 4)


def test_rcm_shuffled_band_recovers():
    """RCM recovers a narrow band from a row-shuffled banded matrix."""
    rng = np.random.default_rng(1)
    A = staircase(seed=1)
    shuf = rng.permutation(A.shape[0])
    perm, bw = rcm_native(A[shuf])
    assert bw <= 40  # unshuffled bandwidth is 26; dense would be m-1 = 95


def test_rcm_disconnected_components():
    A = np.zeros((8, 12))
    A[:4, :6] = 1.0
    A[4:, 6:] = 1.0
    perm, bw = rcm_native(A)
    assert sorted(perm.tolist()) == list(range(8))
    assert bw == 3  # each component is a 4-clique


def test_tile_plan_schedule_invariants():
    A = block_angular()
    plan = tile_plan_native(A, 16)
    assert isinstance(plan, dict)
    nbr, ntiles = plan["nbr"], plan["ntiles"]
    assert nbr == -(-A.shape[0] // 16)
    # Diagonal ids are 0..nbr-1; subdiagonal ids nbr..ntiles-1; dummy pads.
    ids = plan["col_ids"]
    rows = plan["col_blkrows"]
    real = ids != ntiles
    assert np.all(ids[real] >= nbr) and np.all(ids[real] < ntiles)
    assert np.all(rows[real] < nbr)
    assert np.all(rows[~real] == nbr)
    # Each real subdiagonal id appears exactly once.
    flat = ids[real]
    assert len(np.unique(flat)) == len(flat) == ntiles - nbr
    # Per column, block rows strictly below the diagonal and increasing.
    for j in range(nbr):
        r = rows[j][ids[j] != ntiles]
        assert np.all(r > j)
        assert np.all(np.diff(r) > 0)
    # Update targets are valid tile ids or the dummy.
    assert np.all(plan["u_tgt"] <= ntiles)


def test_tile_plan_conformance():
    """Sparse backend driven by the native plan passes the shipped KKT
    contract test."""
    import jax.numpy as jnp

    from tulip_tpu.kkt.sparse import SparseK1Backend, tile_plan
    from tulip_tpu.kkt.testkit import run_ls_tests

    A = block_angular()
    plan = tile_plan(A, 16, use_native=True)
    assert plan is not None
    run_ls_tests(jnp.asarray(A, jnp.float64), SparseK1Backend(block=16))


def test_tile_plan_dense_no_advantage():
    A = np.asarray(np.random.default_rng(2).standard_normal((64, 96)))
    assert tile_plan_native(A, 16) is None
