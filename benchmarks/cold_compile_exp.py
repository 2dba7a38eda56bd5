"""Find the cold-compile hog in the batched HSD program (round-4 item 1).

Each variant bakes a unique tolerance constant into the program so the
axon service's server-side executable cache cannot hit; first-call wall
time is then a true cold compile+run measurement.

Run one variant per process: python -m benchmarks.cold_compile_exp VARIANT SALT
"""

import sys
import time

import numpy as np


def main():
    variant = sys.argv[1]
    salt = int(sys.argv[2])  # cache-busting: perturbs tolerance in ulp-space

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from tulip_tpu.ipm.batch import batched_hsd_solve, stack_lps_host
    from tulip_tpu.ipm.hsd import HSDOptions
    from tulip_tpu.kkt import DenseK1Backend, PallasSmallK1Backend

    nb = 256 if variant == "b256" else 2048
    rng = np.random.default_rng(0)
    out = []
    for _ in range(nb):
        A = rng.standard_normal((48, 96))
        u = rng.uniform(1.0, 4.0, 96)
        x0 = u * rng.uniform(0.2, 0.8, 96)
        out.append((A, A @ x0, rng.standard_normal(96), 0.0, np.zeros(96), u))
    dats = stack_lps_host(out, dtype=jnp.float32)
    np.asarray(dats.A)  # force the transfer before timing

    tol = 3e-4 * (1.0 + salt * 1e-7)
    kw = dict(TolerancePFeas=tol, ToleranceDFeas=tol, ToleranceRGap=tol,
              ToleranceIFeas=tol, PRegMin=1e-6, DRegMin=1e-6)
    if variant in ("nocorr", "nocorr_dense"):
        kw["CorrectionLimit"] = 0
    backend = (DenseK1Backend(inv_factor=True, refinement_steps=1)
               if variant in ("dense", "nocorr_dense")
               else PallasSmallK1Backend(refinement_steps=1))
    opts = HSDOptions(**kw)

    t0 = time.time()
    res = batched_hsd_solve(backend, opts, dats)
    st = np.asarray(res.status)
    t1 = time.time()
    n_opt = int((st == 2).sum())
    t2 = time.time()
    wall = min(
        (lambda: (lambda s: (np.asarray(
            batched_hsd_solve(backend, opts, dats).status),
            time.time() - s)[1])(time.time()))()
        for _ in range(2))
    print(f"variant={variant:14s} salt={salt} first_call={t1-t0:7.1f}s "
          f"steady={wall:6.3f}s optimal={n_opt}/{nb}", flush=True)


if __name__ == "__main__":
    main()
