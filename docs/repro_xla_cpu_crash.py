"""Attempted minimal repro for the XLA:CPU resident-executable crash
(see xla_cpu_executable_crash.md). Compiles N distinct trivial programs,
then one large tiled-K2 program, printing progress so a hard crash is
attributable.

Usage: python docs/repro_xla_cpu_crash.py [N]
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    n_progs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    for i in range(n_progs):
        # unique shape -> unique executable
        x = jnp.ones((7 + i, 3))

        @jax.jit
        def f(x):
            return (x * 2.0 + 1.0).sum(axis=1)

        jax.block_until_ready(f(x))
        if (i + 1) % 50 == 0:
            print(f"{i + 1} executables resident", flush=True)

    print("compiling the large tiled-K2 program ...", flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "benchmarks"))
    from bench_sparse import staircase

    from tulip_tpu.kkt.sparse_ldl import SparseK2Backend

    A = jnp.asarray(staircase(2048, np.float64))
    m, n = A.shape
    be = SparseK2Backend(refinement_steps=2)
    st = be.setup(A)
    ti = jnp.ones(n)
    st2, ok = jax.jit(lambda s, t: be.update(
        s, t, jnp.full(n, 1e-8), jnp.full(m, 1e-8)))(st, ti)
    jax.block_until_ready(st2.T)
    print(f"ok = {bool(ok)} — no crash", flush=True)


if __name__ == "__main__":
    main()
