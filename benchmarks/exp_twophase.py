"""Two-phase batched solve experiment (round 4).

The vmapped while_loop's wall-clock is set by the SLOWEST lane (iters
p50 7, max 12 on the 2048-LP bench) — every converged lane still rides
along. Phase 1 caps IterationsLimit at k; phase 2 gathers the
unconverged tail (status == ITERATION_LIMIT) into a pow2-padded small
batch and resumes it from its states.

Usage: python -m benchmarks.exp_twophase [k ...]
"""

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from tulip_tpu.ipm.batch import batched_hsd_solve, stack_lps_host
    from tulip_tpu.ipm.hsd import HSDOptions
    from tulip_tpu.kkt import PallasSmallK1Backend
    from tulip_tpu.status import TerminationStatus

    _ITL = int(TerminationStatus.ITERATION_LIMIT)
    _UNK = int(TerminationStatus.UNKNOWN)
    _OPT = int(TerminationStatus.OPTIMAL)

    rng = np.random.default_rng(0)
    NB, M, N = 2048, 48, 96
    raws = []
    for _ in range(NB):
        A = rng.standard_normal((M, N))
        u = rng.uniform(1.0, 4.0, N)
        x0 = u * rng.uniform(0.2, 0.8, N)
        raws.append((A, A @ x0, rng.standard_normal(N), 0.0,
                     np.zeros(N), u))
    dats = stack_lps_host(raws, dtype=jnp.float32)
    kw = dict(TolerancePFeas=3e-4, ToleranceDFeas=3e-4, ToleranceRGap=3e-4,
              ToleranceIFeas=3e-4, PRegMin=1e-6, DRegMin=1e-6)
    backend = PallasSmallK1Backend(refinement_steps=1)

    from tulip_tpu.ipm.batch import _solve_one  # reuse inner
    from functools import partial
    import jax as _jax

    @partial(jax.jit, static_argnames=("opts_",))
    def resume(opts_, dats_, states_):
        from tulip_tpu.ipm.hsd import full_matmul_precision, hsd_iteration

        def one(d, s):
            s = s._replace(status=jnp.asarray(_UNK, jnp.int32))

            def cond(st):
                return st.status == _UNK

            def body(st):
                return hsd_iteration(backend, opts_, d, st)

            return jax.lax.while_loop(cond, body, s)

        with jax.default_matmul_precision("highest"):
            return jax.vmap(one)(dats_, states_)

    # Baseline single-phase.
    opts_full = HSDOptions(**kw)
    out = batched_hsd_solve(backend, opts_full, dats)
    np.asarray(out.status)
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(batched_hsd_solve(backend, opts_full, dats).status)
        ts.append(time.time() - t0)
    base = min(ts)
    st = np.asarray(out.status)
    print(f"single-phase: {base*1e3:.1f} ms  "
          f"({NB/base:.0f} solves/s), optimal {(st==_OPT).sum()}/{NB}, "
          f"iter max {np.asarray(out.niter).max()}", flush=True)

    for k in [int(a) for a in sys.argv[1:]] or [7, 8, 9]:
        opts1 = HSDOptions(IterationsLimit=k, **kw)

        def run_twophase():
            out1 = batched_hsd_solve(backend, opts1, dats)
            st1 = np.asarray(out1.status)
            idx = np.flatnonzero(st1 == _ITL)
            if idx.size == 0:
                return out1, st1, 0
            pad = max(16, 1 << (int(idx.size - 1)).bit_length())
            idxp = np.concatenate([idx, np.repeat(idx[:1], pad - idx.size)])
            gather = lambda t: jax.tree_util.tree_map(
                lambda x: x[jnp.asarray(idxp)], t)
            out2 = resume(opts_full, gather(dats), gather(out1))
            st2 = np.asarray(out2.status)
            return (out1, out2, idxp), st1, idx.size

        _, st1, ntail = run_twophase()
        ts = []
        for _ in range(3):
            t0 = time.time()
            run_twophase()
            ts.append(time.time() - t0)
        w = min(ts)
        print(f"two-phase k={k}: {w*1e3:.1f} ms ({NB/w:.0f} solves/s), "
              f"tail lanes {ntail}", flush=True)


if __name__ == "__main__":
    main()
