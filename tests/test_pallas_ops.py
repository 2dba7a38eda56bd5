"""Pallas kernel unit tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tulip_tpu  # noqa: F401
from tulip_tpu.ops import cholesky_inverse_pallas, cholesky_pallas


def spd(m, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((m, m))
    return jnp.asarray(X @ X.T + m * np.eye(m), dtype)


@pytest.mark.parametrize("m", [8, 48, 64, 100])
def test_cholesky_pallas_matches_xla(m):
    K = spd(m)
    L = cholesky_pallas(K, interpret=True)
    Lref = jnp.linalg.cholesky(K)
    assert float(jnp.max(jnp.abs(L - Lref))) < 1e-4 * m


@pytest.mark.parametrize("m", [8, 48, 64])
def test_cholesky_inverse_pallas(m):
    K = spd(m, seed=1)
    Li = cholesky_inverse_pallas(K, interpret=True)
    # L⁻¹ L = I.
    L = jnp.linalg.cholesky(K)
    err = jnp.max(jnp.abs(Li @ L - jnp.eye(m, dtype=K.dtype)))
    assert float(err) < 1e-4
    # Lower triangular.
    assert float(jnp.max(jnp.abs(jnp.triu(Li, 1)))) == 0.0


def test_cholesky_pallas_vmap_batching():
    rng = np.random.default_rng(2)
    X = rng.standard_normal((5, 16, 16)).astype(np.float32)
    Ks = jnp.einsum("bij,bkj->bik", X, X) + 16 * jnp.eye(16,
                                                         dtype=jnp.float32)
    Lb = jax.vmap(lambda k: cholesky_pallas(k, interpret=True))(Ks)
    np.testing.assert_allclose(np.asarray(Lb),
                               np.asarray(jnp.linalg.cholesky(Ks)),
                               atol=1e-4)


def test_cholesky_pallas_nonspd_gives_nonfinite():
    K = -spd(16)
    L = cholesky_pallas(K, interpret=True)
    assert not bool(jnp.all(jnp.isfinite(L)))


def test_batched_chol_inverse_nondivisible_batch():
    from tulip_tpu.ops.chol import batched_cholesky_inverse_pallas

    rng = np.random.default_rng(3)
    B = 7  # not a multiple of any nice block size
    X = rng.standard_normal((B, 12, 12)).astype(np.float32)
    Ks = jnp.einsum("bij,bkj->bik", X, X) + 12 * jnp.eye(12,
                                                         dtype=jnp.float32)
    Li = batched_cholesky_inverse_pallas(Ks, block=4, interpret=True)
    assert Li.shape == (B, 12, 12)
    L = jnp.linalg.cholesky(Ks)
    err = jnp.max(jnp.abs(jnp.einsum("bij,bjk->bik", Li, L)
                          - jnp.eye(12, dtype=jnp.float32)))
    assert float(err) < 1e-4


def test_packed_chol_inverse_interpret():
    """Lane-packed kernel variant (p instances side-by-side in the lane
    dim) matches numpy across pack factors and odd batch sizes."""
    import numpy as np

    from tulip_tpu.ops.chol import batched_cholesky_inverse_pallas

    rng = np.random.default_rng(0)
    for B, m, pack in [(5, 48, 2), (3, 20, 3), (7, 64, 2), (9, 16, 4)]:
        X = rng.standard_normal((B, m, m)).astype(np.float32)
        K = np.einsum("bij,bkj->bik", X, X) + 3 * m * np.eye(
            m, dtype=np.float32)
        Li = batched_cholesky_inverse_pallas(jnp.asarray(K), pack=pack,
                                             interpret=True)
        for i in range(B):
            L = np.linalg.cholesky(K[i])
            np.testing.assert_allclose(np.asarray(Li[i]), np.linalg.inv(L),
                                       atol=5e-5)


def test_fused_k1_solve_interpret():
    """Fused solve kernel (RHS assembly + inverse-factor applications +
    refinement in one op) matches the augmented-system contract and its
    custom_vmap rule matches the batched entry."""
    import numpy as np

    from tulip_tpu.ops.solve import fused_k1_solve

    rng = np.random.default_rng(0)
    B, m, n = 6, 48, 96
    A = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
    treg = jnp.asarray(10.0 ** rng.uniform(-2, 2, (B, n)), jnp.float32)
    d = 1.0 / treg
    regD = jnp.full((B, m), 1e-4, jnp.float32)
    xi_p = jnp.asarray(rng.standard_normal((B, m)), jnp.float32)
    xi_d = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    K = np.einsum("bij,bkj->bik",
                  np.asarray(A) * np.asarray(d)[:, None, :], np.asarray(A))
    K += np.asarray(regD)[:, :, None] * np.eye(m)[None]
    Li = jnp.asarray(np.stack([np.linalg.inv(np.linalg.cholesky(K[i]))
                               for i in range(B)]), jnp.float32)

    dx, dy = fused_k1_solve(A, Li, d, treg, regD, xi_p, xi_d, refine=2,
                            interpret=True)
    rd = np.asarray(xi_d) - (-(np.asarray(treg) * np.asarray(dx))
                             + np.einsum("bij,bi->bj", np.asarray(A),
                                         np.asarray(dy)))
    rp = np.asarray(xi_p) - (np.einsum("bij,bj->bi", np.asarray(A),
                                       np.asarray(dx))
                             + np.asarray(regD) * np.asarray(dy))
    assert np.abs(rd).max() < 1e-4
    assert np.abs(rp).max() < 1e-4

    fv = jax.vmap(lambda a, li, dd, tr, rg, p, q: fused_k1_solve(
        a, li, dd, tr, rg, p, q, refine=2, interpret=True))
    dx2, dy2 = fv(A, Li, d, treg, regD, xi_p, xi_d)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx2))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(dy2))


def test_pallas_small_fused_solve_end_to_end():
    """HSD solve through the fused-solve variant (interpret mode) matches
    HiGHS."""
    import numpy as np
    from scipy.optimize import linprog

    from tulip_tpu.ipm.data import make_lp_data
    from tulip_tpu.ipm.hsd import HSDOptions, hsd_solve
    from tulip_tpu.kkt import PallasSmallK1Backend

    rng = np.random.default_rng(4)
    m, n = 10, 20
    A = rng.standard_normal((m, n))
    u = rng.uniform(1, 4, n)
    x0 = u * rng.uniform(0.2, 0.8, n)
    b = A @ x0
    c = rng.standard_normal(n)
    dat = make_lp_data(A, b, c, 0.0, np.zeros(n), u, dtype=jnp.float32)
    out = hsd_solve(dat, PallasSmallK1Backend(interpret=True,
                                              fused_solve=True,
                                              refinement_steps=1),
                    HSDOptions(TolerancePFeas=3e-4, ToleranceDFeas=3e-4,
                               ToleranceRGap=3e-4, ToleranceIFeas=3e-4,
                               PRegMin=1e-6, DRegMin=1e-6))
    assert int(out.status) == 2
    r = linprog(c, A_eq=A, b_eq=b, bounds=list(zip(np.zeros(n), u)),
                method="highs")
    assert abs(float(out.pobj) - r.fun) < 1e-2 * max(1, abs(r.fun))
