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
