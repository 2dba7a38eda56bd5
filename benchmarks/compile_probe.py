"""Diagnose the cold-compile time of the batched HSD solve program.

Round-3 postmortem: `bench.py`'s batched program took 262 s to compile from
a cold XLA cache, which ate the driver's whole budget (BENCH_r03 rc=124).
This probe times trace (jaxpr), lowering (StableHLO) and XLA compile
separately for several program variants so we know where the time goes.

Usage: python benchmarks/compile_probe.py [variant ...]
Variants: full, b256, nocorr, nobump, nocorr_nobump, xla
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    # NO persistent cache: we want true cold-compile numbers.
    import jax.numpy as jnp

    from tulip_tpu.ipm.batch import batched_hsd_solve, stack_lps_host
    from tulip_tpu.ipm.hsd import HSDOptions
    from tulip_tpu.kkt import DenseK1Backend, PallasSmallK1Backend

    variants = sys.argv[1:] or ["full"]

    def make(nb):
        rng = np.random.default_rng(0)
        out = []
        for _ in range(nb):
            A = rng.standard_normal((48, 96))
            u = rng.uniform(1.0, 4.0, 96)
            x0 = u * rng.uniform(0.2, 0.8, 96)
            out.append((A, A @ x0, rng.standard_normal(96), 0.0,
                        np.zeros(96), u))
        return stack_lps_host(out, dtype=jnp.float32)

    base = dict(TolerancePFeas=3e-4, ToleranceDFeas=3e-4, ToleranceRGap=3e-4,
                ToleranceIFeas=3e-4, PRegMin=1e-6, DRegMin=1e-6)

    for v in variants:
        nb = 256 if v == "b256" else 2048
        opts = dict(base)
        if v in ("nocorr", "nocorr_nobump"):
            opts["CorrectionLimit"] = 0
        backend = (DenseK1Backend(inv_factor=True, refinement_steps=1)
                   if v == "xla" else PallasSmallK1Backend(refinement_steps=1))
        o = HSDOptions(**opts)
        dats = make(nb)

        t0 = time.time()
        traced = batched_hsd_solve.trace(backend, o, dats)
        t1 = time.time()
        lowered = traced.lower()
        t2 = time.time()
        compiled = lowered.compile()
        t3 = time.time()
        log(f"variant={v:16s} nb={nb} trace={t1-t0:6.1f}s "
            f"lower={t2-t1:6.1f}s compile={t3-t2:6.1f}s total={t3-t0:6.1f}s")
        del traced, lowered, compiled


if __name__ == "__main__":
    main()
