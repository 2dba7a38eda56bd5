"""Profile the per-iteration kernel components on the current accelerator:
batched Gram assembly (A D Aᵀ), batched Cholesky, batched triangular
solves — the entire per-iteration cost profile of the IPM (reference
profile: src/IPM/HSD/step.jl:37,63,79,93). Guides which ops deserve
custom Pallas kernels vs XLA defaults.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., 0])
    return (time.time() - t0) / reps


def profile(B, m, n, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, m, n)), dtype)
    d = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)), dtype)
    reg = jnp.asarray(np.full((B, m), 1e-6), dtype)
    rhs = jnp.asarray(rng.standard_normal((B, m)), dtype)

    with jax.default_matmul_precision("highest"):
        @jax.jit
        def gram(A, d, reg):
            Bm = A * jnp.sqrt(d)[:, None, :]
            K = jnp.einsum("bij,bkj->bik", Bm, Bm)
            return K + jax.vmap(jnp.diag)(reg)

        @jax.jit
        def chol(K):
            return jnp.linalg.cholesky(K)

        @jax.jit
        def trisolve(L, r):
            w = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)
            return jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(L, -1, -2), w, lower=False)[..., 0]

        @jax.jit
        def matvec(A, r):
            return jnp.einsum("bij,bj->bi", jnp.swapaxes(A, -1, -2), r)

        K = gram(A, d, reg)
        L = chol(K)

        t_gram = timeit(lambda: gram(A, d, reg))
        t_chol = timeit(lambda: chol(K))
        t_tri = timeit(lambda: trisolve(L, rhs))
        t_mv = timeit(lambda: matvec(A, rhs))

    gram_fl = 2 * B * m * m * n
    chol_fl = B * m ** 3 / 3
    tri_fl = 2 * B * m * m
    print(f"B={B:5d} m={m:5d} n={n:5d} {np.dtype(dtype.dtype.name if hasattr(dtype,'dtype') else dtype).name}")
    print(f"  gram     {t_gram*1e3:8.3f} ms  {gram_fl/t_gram/1e12:7.2f} TFLOP/s")
    print(f"  cholesky {t_chol*1e3:8.3f} ms  {chol_fl/t_chol/1e12:7.2f} TFLOP/s")
    print(f"  trisolve {t_tri*1e3:8.3f} ms  {tri_fl/t_tri/1e12:7.2f} TFLOP/s")
    print(f"  matvec   {t_mv*1e3:8.3f} ms")
    sys.stdout.flush()


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, jax.devices()[0])
    # Batched small (the scenario-batch headline workload).
    profile(1024, 48, 96)
    profile(1024, 64, 128)
    profile(256, 128, 256)
    # Large single instances (big-LP regime).
    profile(1, 1024, 2048)
    profile(1, 2048, 4096)
    profile(8, 512, 1024)
