"""End-to-end comparison of dense-K1 backend variants on the batched
workload (the decision-relevant measurement on remote-dispatch setups:
whole while_loop solve = one dispatch)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tulip_tpu.ipm.batch import batched_hsd_solve, stack_lps
    from tulip_tpu.ipm.data import make_lp_data
    from tulip_tpu.ipm.hsd import HSDOptions
    from tulip_tpu.kkt import DenseK1Backend, PallasSmallK1Backend
    from bench import make_raw_instances

    NB, M, N = 1024, 48, 96
    raws = make_raw_instances(NB, M, N)
    lps = [make_lp_data(A, b, c, 0.0, np.zeros(len(c)), u,
                        dtype=jnp.float32) for (A, b, c, u) in raws]
    dats = stack_lps(lps)
    tol = 3e-4
    opts = HSDOptions(TolerancePFeas=tol, ToleranceDFeas=tol,
                      ToleranceRGap=tol, ToleranceIFeas=tol,
                      PRegMin=1e-6, DRegMin=1e-6)

    print("platform:", jax.devices()[0], flush=True)
    for name, backend in [
        ("inv-factor refine=0", DenseK1Backend(inv_factor=True)),
        ("pallas-small r=0   ", PallasSmallK1Backend()),
        ("pallas-small r=1   ", PallasSmallK1Backend(refinement_steps=1)),
    ]:
        def run():
            t0 = time.time()
            out = batched_hsd_solve(backend, opts, dats)
            np.asarray(out.status)
            return time.time() - t0, out

        t_first, out = run()
        wall = min(run()[0] for _ in range(3))
        st = np.asarray(out.status)
        it = np.asarray(out.niter)
        print(f"{name}: {NB/wall:9.1f} solves/s  wall {wall*1e3:7.1f} ms  "
              f"opt {int((st == 2).sum())}/{NB}  iters {it.mean():.1f}  "
              f"(compile {t_first:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
