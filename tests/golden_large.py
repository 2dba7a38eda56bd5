"""Large structured golden LP generators (m ≥ 2048): the regime the
model auto-probe targets (banded / tiled-sparse / SMW backends). These
stand in for large Netlib/Mittelmann instances (zero-egress image); the
correctness oracle is scipy HiGHS on the same (sparse) data.

All generators return (A_csr, b, c, u): min cᵀx s.t. Ax = b, 0 ≤ x ≤ u,
built feasible-bounded by construction (b = A x0 with interior x0).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import tulip_tpu as tlp


def staircase_lp(m, mr=64, nc=96, dense_cols=0, cyclic=False, seed=0,
                 dense_scale=0.5):
    """Staircase (time-structured) equality LP; ``cyclic`` adds the
    wrap-around coupling that defeats a pure band ordering;
    ``dense_cols`` adds global linking columns (the K1-fill killer)."""
    rng = np.random.default_rng(seed)
    stages = m // mr
    n = stages * nc + (0 if cyclic else nc)
    I, J, V = [], [], []
    for s in range(stages):
        for c0 in (s * nc, ((s + 1) % stages) * nc if cyclic
                   else (s + 1) * nc):
            ii, jj = np.meshgrid(np.arange(s * mr, (s + 1) * mr),
                                 np.arange(c0, c0 + nc), indexing="ij")
            I.append(ii.ravel())
            J.append(jj.ravel())
            V.append(rng.standard_normal(mr * nc))
    for k in range(dense_cols):
        I.append(np.arange(m))
        J.append(np.full(m, (7 * k) % n))
        V.append(rng.standard_normal(m) * dense_scale)
    I, J, V = map(np.concatenate, (I, J, V))
    A = sp.csr_matrix((V, (I, J)), shape=(m, n))
    u = rng.uniform(1, 3, n)
    x0 = u * rng.uniform(0.3, 0.7, n)
    return A, np.asarray(A @ x0), rng.standard_normal(n), u


def block_angular_lp(K=16, mk=130, nk=192, n0=64, seed=3):
    """Two-stage stochastic block-angular LP: n0 first-stage variables
    coupling into K scenario blocks (W_k y_k + T_k x = h_k). The
    first-stage columns touch every scenario row — exactly the
    dense-column pattern the SMW splitting backend exists for."""
    rng = np.random.default_rng(seed)
    m = K * mk
    n = n0 + K * nk
    I, J, V = [], [], []
    for k in range(K):
        r0 = k * mk
        ii, jj = np.meshgrid(np.arange(r0, r0 + mk), np.arange(n0),
                             indexing="ij")
        I.append(ii.ravel())
        J.append(jj.ravel())
        V.append(rng.standard_normal(mk * n0) * 0.3)   # T_k
        c0 = n0 + k * nk
        ii, jj = np.meshgrid(np.arange(r0, r0 + mk),
                             np.arange(c0, c0 + nk), indexing="ij")
        I.append(ii.ravel())
        J.append(jj.ravel())
        V.append(rng.standard_normal(mk * nk))         # W_k
    I, J, V = map(np.concatenate, (I, J, V))
    A = sp.csr_matrix((V, (I, J)), shape=(m, n))
    u = rng.uniform(1, 3, n)
    x0 = u * rng.uniform(0.3, 0.7, n)
    return A, np.asarray(A @ x0), rng.standard_normal(n), u


def scattered_coupling_lp(m=2048, mr=64, nc=96, ncouple=10, seed=4):
    """Staircase plus random long-range stage couplings: the scattered
    off-band blocks defeat any band ordering (RCM bandwidth ~ m) but
    stay cheap for tile-granular fill."""
    rng = np.random.default_rng(seed)
    A, b, c, u = staircase_lp(m, mr=mr, nc=nc, seed=seed)
    stages = m // mr
    n = A.shape[1]
    I, J, V = [], [], []
    for _ in range(ncouple):
        s, t = rng.choice(stages, 2, replace=False)
        ii, jj = np.meshgrid(np.arange(s * mr, (s + 1) * mr),
                             np.arange(t * nc, (t + 1) * nc),
                             indexing="ij")
        I.append(ii.ravel())
        J.append(jj.ravel())
        V.append(rng.standard_normal(mr * nc) * 0.3)
    I, J, V = map(np.concatenate, (I, J, V))
    A = (A + sp.csr_matrix((V, (I, J)), shape=A.shape)).tocsr()
    u = rng.uniform(1, 3, n)
    x0 = u * rng.uniform(0.3, 0.7, n)
    return A, np.asarray(A @ x0), rng.standard_normal(n), u


def multiperiod_lp(m=8192, seed=0):
    """Multiperiod production/inventory chain — a long pure staircase
    (the banded backend's design point)."""
    return staircase_lp(m, mr=64, nc=96, seed=seed)


def load_model(A: sp.csr_matrix, b, c, u, name="large") -> "tlp.Model":
    """Bulk-load the equality-form LP into a Model."""
    n = A.shape[1]
    coo = A.tocoo()
    mod = tlp.Model()
    mod.pbdata.load(True, c, 0.0, (coo.row, coo.col, coo.data),
                    b, b, np.zeros(n), u, name=name)
    return mod


def highs_optimum(A, b, c, u) -> float:
    from scipy.optimize import linprog

    n = A.shape[1]
    r = linprog(c, A_eq=A, b_eq=b,
                bounds=list(zip(np.zeros(n), u)), method="highs")
    assert r.status == 0, r.message
    return float(r.fun)
