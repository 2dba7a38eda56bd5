"""Elimination-level scheduled execution (kkt/levels.py).

Covers the host symbolic pieces (nested dissection, level assignment,
schedule invariants) and the device executors through the K1/K2/banded
backends, against the column-scheduled paths and the augmented-system
contract. Runs on the CPU test platform (conftest).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tulip_tpu.kkt.levels import (build_level_plan, column_levels,
                                  nd_block_order, tile_fill)


def _staircase(stages=16, mr=16, nc=20, cyclic=False, seed=0):
    rng = np.random.default_rng(seed)
    m = stages * mr
    n = stages * nc + (0 if cyclic else nc)
    A = np.zeros((m, n))
    for s in range(stages):
        A[s*mr:(s+1)*mr, s*nc:(s+1)*nc] = rng.standard_normal((mr, nc))
        t = ((s + 1) % stages) if cyclic else (s + 1)
        A[s*mr:(s+1)*mr, t*nc:(t+1)*nc] = rng.standard_normal((mr, nc))
    return A


def _chain_pattern(nbr):
    bi = np.concatenate([np.arange(nbr), np.arange(1, nbr),
                         np.arange(nbr - 1)])
    bj = np.concatenate([np.arange(nbr), np.arange(nbr - 1),
                         np.arange(1, nbr)])
    return bi, bj


def test_nd_block_order_is_permutation_and_shallow():
    """ND on a 64-chain is a permutation whose elimination levels are
    logarithmically few (the whole point vs the RCM chain's 64)."""
    nbr = 64
    bi, bj = _chain_pattern(nbr)
    order = nd_block_order(bi, bj, nbr)
    assert sorted(order.tolist()) == list(range(nbr))
    binv = np.empty(nbr, np.int64)
    binv[order] = np.arange(nbr)
    col_rows = tile_fill(binv[bi], binv[bj], nbr)
    lv = column_levels(col_rows)
    assert int(lv.max()) + 1 <= 14          # ~2·log2(64), not 64
    # RCM/identity order on the same chain is fully sequential.
    lv_chain = column_levels(tile_fill(bi, bj, nbr))
    assert int(lv_chain.max()) + 1 == nbr


def test_nd_respects_forced_last_blocks():
    nbr = 16
    bi, bj = _chain_pattern(nbr)
    order = nd_block_order(bi, bj, nbr, last=[3, 7])
    assert set(order[-2:].tolist()) == {3, 7}


def test_level_plan_invariants():
    """Updates only target strictly-later levels; sub owners index the
    level's own columns; tile ids cover the filled pattern exactly."""
    nbr = 32
    bi, bj = _chain_pattern(nbr)
    order = nd_block_order(bi, bj, nbr)
    binv = np.empty(nbr, np.int64)
    binv[order] = np.arange(nbr)
    col_rows = tile_fill(binv[bi], binv[bj], nbr)
    plan = build_level_plan(col_rows, nbr)
    assert plan.ntiles == nbr + sum(len(c) for c in col_rows)
    level_of_col = column_levels(col_rows)
    # tile -> level of its owner column
    tile_level = level_of_col[plan.tile_bcol]
    for k, seg in enumerate(plan.segs):
        cols = np.asarray(seg.cols)
        assert np.all(level_of_col[cols] == k)
        owners = np.asarray(seg.sub_owner)
        assert np.all(owners < len(cols))
        # each sub tile belongs to its owner's column
        sub_cols = np.asarray(plan.tile_bcol)[np.asarray(seg.sub_ids)]
        assert np.all(sub_cols == cols[owners])
        # updates target strictly later levels
        tgt = np.asarray(seg.u_tgt)
        if tgt.size:
            assert np.all(tile_level[tgt] > k)


def _contract_residual(be, A, seed=7, theta_span=4):
    rng = np.random.default_rng(seed)
    m, n = A.shape
    theta_inv = jnp.asarray(10.0 ** rng.uniform(-theta_span, theta_span, n))
    regP = jnp.full(n, 1e-8)
    regD = jnp.full(m, 1e-8)
    st = be.setup(jnp.asarray(A))
    st, ok = be.update(st, theta_inv, regP, regD)
    assert bool(ok)
    xi_p = jnp.asarray(rng.standard_normal(m))
    xi_d = jnp.asarray(rng.standard_normal(n))
    dx, dy = be.solve(st, xi_p, xi_d)
    rd = np.asarray(xi_d) - (-(np.asarray(theta_inv) + 1e-8) * np.asarray(dx)
                             + A.T @ np.asarray(dy))
    rp = np.asarray(xi_p) - (A @ np.asarray(dx) + 1e-8 * np.asarray(dy))
    return type(st).__name__, max(np.max(np.abs(rd)), np.max(np.abs(rp)))


def test_level_k1_matches_contract_and_column():
    from tulip_tpu.kkt.sparse import SparseK1Backend

    A = _staircase(cyclic=True, seed=1)
    name_lv, res_lv = _contract_residual(
        SparseK1Backend(block=16, refinement_steps=2, schedule="level"), A)
    name_co, res_co = _contract_residual(
        SparseK1Backend(block=16, refinement_steps=2, schedule="column"), A)
    assert name_lv == "SparseK1LevelState"
    assert name_co == "SparseK1State"
    assert res_lv < 1e-9
    assert res_co < 1e-9


def test_level_k1_trsm_variant():
    from tulip_tpu.kkt.sparse import SparseK1Backend

    A = _staircase(seed=2)
    name, res = _contract_residual(
        SparseK1Backend(block=16, refinement_steps=2, schedule="level",
                        inv_factor=False), A)
    assert name == "SparseK1LevelState"
    assert res < 1e-9


@pytest.mark.slow
def test_level_k2_optin_f64():
    """K2's level schedule is OPT-IN (quasi-definite growth under ND —
    see SparseK2Backend.schedule); at f64 on a moderate problem with
    refinement it still satisfies the contract."""
    from tulip_tpu.kkt.sparse_ldl import SparseK2Backend, SparseK2LevelState

    A = _staircase(seed=3)
    A[:, 0] = np.random.default_rng(4).standard_normal(A.shape[0])
    be = SparseK2Backend(block=32, refinement_steps=3, schedule="level")
    st = be.setup(jnp.asarray(A))
    assert isinstance(st, SparseK2LevelState)
    name, res = _contract_residual(be, A, theta_span=2)
    assert res < 1e-8


def test_k2_default_schedule_is_column():
    from tulip_tpu.kkt.sparse_ldl import SparseK2Backend, SparseK2State

    A = _staircase(seed=5)
    st = SparseK2Backend(block=32).setup(jnp.asarray(A))
    assert isinstance(st, SparseK2State)


def test_banded_level_delegation():
    from tulip_tpu.kkt.banded import BandedK1Backend
    from tulip_tpu.kkt.sparse import SparseK1LevelState

    A = _staircase(stages=24, mr=8, nc=12, seed=6)
    be = BandedK1Backend(min_block=16, refinement_steps=2)
    st = be.setup(jnp.asarray(A))
    assert isinstance(st, SparseK1LevelState)
    name, res = _contract_residual(be, A)
    assert res < 1e-9


@pytest.mark.slow
def test_smw_level_inner_end_to_end():
    """Full HSD solve through SMW-with-level-inner vs HiGHS."""
    from scipy.optimize import linprog

    from tulip_tpu.ipm.data import make_lp_data
    from tulip_tpu.ipm.hsd import HSDOptions, hsd_solve
    from tulip_tpu.kkt.splitting import SplitK1Backend, SplitK1State
    from tulip_tpu.kkt.sparse import SparseK1LevelState

    rng = np.random.default_rng(8)
    A = _staircase(stages=24, mr=8, nc=12, seed=8)
    A[:, 5] = rng.standard_normal(A.shape[0]) * 0.5   # dense column
    m, n = A.shape
    u = rng.uniform(1, 3, n)
    x0 = u * rng.uniform(0.3, 0.7, n)
    b = A @ x0
    c = rng.standard_normal(n)

    be = SplitK1Backend(block=16, refinement_steps=2, schedule="level")
    st = be.setup(jnp.asarray(A))
    assert isinstance(st, SplitK1State)
    assert isinstance(st.inner, SparseK1LevelState)

    dat = make_lp_data(A, b, c, 0.0, np.zeros(n), u)
    out = hsd_solve(dat, be, HSDOptions())
    assert int(out.status) == 2
    r = linprog(c, A_eq=A, b_eq=b, bounds=list(zip(np.zeros(n), u)),
                method="highs")
    assert r.status == 0
    assert abs(float(out.pobj) - r.fun) < 1e-7 * max(1, abs(r.fun))


def test_level_hsd_end_to_end_staircase():
    """Full HSD solve through the level-scheduled K1 backend vs HiGHS."""
    from scipy.optimize import linprog

    from tulip_tpu.ipm.data import make_lp_data
    from tulip_tpu.ipm.hsd import HSDOptions, hsd_solve
    from tulip_tpu.kkt.sparse import SparseK1Backend

    rng = np.random.default_rng(9)
    A = _staircase(stages=16, mr=8, nc=12, cyclic=True, seed=9)
    m, n = A.shape
    u = rng.uniform(1, 3, n)
    x0 = u * rng.uniform(0.3, 0.7, n)
    b = A @ x0
    c = rng.standard_normal(n)
    dat = make_lp_data(A, b, c, 0.0, np.zeros(n), u)
    out = hsd_solve(dat, SparseK1Backend(block=16, refinement_steps=1,
                                         schedule="level"),
                    HSDOptions())
    assert int(out.status) == 2
    r = linprog(c, A_eq=A, b_eq=b, bounds=list(zip(np.zeros(n), u)),
                method="highs")
    assert r.status == 0
    assert abs(float(out.pobj) - r.fun) < 1e-7 * max(1, abs(r.fun))
