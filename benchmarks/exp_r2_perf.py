"""Round-2 perf experiments on the 2048-LP batched bench.

Measures (a) the niter tail that sets while_loop wall-clock, (b) an
explicit-M^-1 solve variant (1 GEMV/solve instead of 2).
Run: python benchmarks/exp_r2_perf.py [variant ...]
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp

from bench import make_raw_instances
from tulip_tpu.ipm.batch import batched_hsd_solve, stack_lps_host
from tulip_tpu.ipm.hsd import HSDOptions
from tulip_tpu.kkt import DenseK1Backend, PallasSmallK1Backend
from tulip_tpu.status import TerminationStatus

NB = int(os.environ.get("BENCH_NB", "2048"))
M, N = 48, 96
TOL = 3e-4


def run(backend, opts, dats, label):
    def once():
        t0 = time.time()
        out = batched_hsd_solve(backend, opts, dats)
        np.asarray(out.status)
        return time.time() - t0, out

    t_first, out = once()
    wall = min(once()[0] for _ in range(3))
    st = np.asarray(out.status)
    it = np.asarray(out.niter)
    n_opt = int((st == int(TerminationStatus.OPTIMAL)).sum())
    print(f"{label:28s} opt {n_opt}/{NB} iters mean {it.mean():.2f} "
          f"p50 {np.percentile(it, 50):.0f} p99 {np.percentile(it, 99):.0f} "
          f"max {it.max()}  wall {wall*1e3:.1f} ms  "
          f"rate {NB/wall:,.0f}/s  (first {t_first:.1f}s)", flush=True)
    return out


def main():
    variants = sys.argv[1:] or ["base"]
    print("devices:", jax.devices(), flush=True)
    raws = make_raw_instances(NB, M, N)
    print("instances built", flush=True)
    dats = stack_lps_host(
        [(A, b, c, 0.0, np.zeros(len(c)), u) for (A, b, c, u) in raws],
        dtype=jnp.float32)
    jax.block_until_ready(dats.A)
    print("batch on device", flush=True)
    opts = HSDOptions(TolerancePFeas=TOL, ToleranceDFeas=TOL,
                      ToleranceRGap=TOL, ToleranceIFeas=TOL,
                      PRegMin=1e-6, DRegMin=1e-6)

    for v in variants:
        if v == "base":
            run(PallasSmallK1Backend(refinement_steps=1), opts, dats,
                "pallas-small r1 (current)")
        elif v == "minv":
            run(PallasSmallK1Backend(refinement_steps=1, explicit_minv=True),
                opts, dats, "pallas-small r1 minv")
        elif v == "minv-r0":
            run(PallasSmallK1Backend(refinement_steps=0, explicit_minv=True),
                opts, dats, "pallas-small r0 minv")
        elif v == "r0":
            run(PallasSmallK1Backend(refinement_steps=0), opts, dats,
                "pallas-small r0")
        elif v == "mstart":
            mo = HSDOptions(TolerancePFeas=TOL, ToleranceDFeas=TOL,
                            ToleranceRGap=TOL, ToleranceIFeas=TOL,
                            PRegMin=1e-6, DRegMin=1e-6, MehrotraStart=True)
            run(PallasSmallK1Backend(refinement_steps=1), mo, dats,
                "pallas-small r1 mstart")
        elif v == "mstart-c2":
            mo = HSDOptions(TolerancePFeas=TOL, ToleranceDFeas=TOL,
                            ToleranceRGap=TOL, ToleranceIFeas=TOL,
                            PRegMin=1e-6, DRegMin=1e-6, MehrotraStart=True,
                            CorrectionLimit=2)
            run(PallasSmallK1Backend(refinement_steps=1), mo, dats,
                "pallas-small r1 mstart c2")
        elif v == "fast-pred":
            mo = dataclasses.replace(opts, FastPredictor=True)
            run(PallasSmallK1Backend(refinement_steps=1), mo, dats,
                "pallas-small r1 fastpred")
        elif v == "fast-both":
            mo = dataclasses.replace(opts, FastPredictor=True,
                                     FastCorrections=True)
            run(PallasSmallK1Backend(refinement_steps=1), mo, dats,
                "pallas-small r1 fastboth")
        elif v == "xla":
            run(DenseK1Backend(inv_factor=True, refinement_steps=1), opts,
                dats, "xla inv-factor r1")
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
