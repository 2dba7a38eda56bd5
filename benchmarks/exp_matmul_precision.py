"""Matmul-precision experiment on the factorization path (VERDICT r4
item 8): can "high" (3-pass bf16 ≈ 2× the f32-effective throughput of
6-pass "highest") plus one extra refinement sweep replace "highest" for
the blocked Cholesky, raising the 70%-of-f32-eff ceiling?

Measures, on the chip:

1. m=8192 dense-K1 MFU point — one numeric factorization + one
   unrefined solve under each precision (wall-clock; the flop count is
   identical, so the ratio IS the throughput ratio).
2. Accuracy — augmented-system relative residual after 0/1/2/3
   refinement sweeps under each precision (same inputs, f32 data, θ
   spanning 4 decades like mfu.py).
3. Full solve — the 2048-LP f32 batched bench configuration under each
   precision (+1 extra refinement sweep for "high"): solves/s, mean
   iterations, optimal count.

Accept/reject is written into BASELINE.md like the round-4 SMW study.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mfu_point(prec, m=8192, stage=64, ncol=96):
    from mfu import measure, flops_dense
    from bench_sparse import staircase
    from tulip_tpu.kkt import DenseK1Backend

    A = staircase(m, np.float32)
    be = DenseK1Backend(inv_factor=True)
    with jax.default_matmul_precision(prec):
        dt, fl, _ = measure(be, A, lambda st, mm, nn: flops_dense(st, mm, nn))
    return dt, fl


def residual_sweeps(prec, m=2048, stage=64, ncol=96):
    from bench_sparse import staircase
    from tulip_tpu.kkt import DenseK1Backend

    A = jnp.asarray(staircase(m, np.float32))
    mm, n = A.shape
    rng = np.random.default_rng(3)
    ti = jnp.asarray(10.0 ** rng.uniform(-2, 2, n), A.dtype)
    regP = jnp.full(n, 1e-6, A.dtype)
    regD = jnp.full(mm, 1e-6, A.dtype)
    xi_p = jnp.asarray(rng.standard_normal(mm), A.dtype)
    xi_d = jnp.asarray(rng.standard_normal(n), A.dtype)
    out = {}
    for sweeps in (0, 1, 2, 3):
        be = DenseK1Backend(inv_factor=True, refinement_steps=sweeps)
        with jax.default_matmul_precision(prec):
            st = be.setup(A)
            st, ok = jax.jit(be.update)(st, ti, regP, regD)
            dx, dy = jax.jit(be.solve)(st, xi_p, xi_d)
            rd = xi_d - (-(ti + regP) * dx + A.T @ dy)
            rp = xi_p - (A @ dx + regD * dy)
        scale = float(jnp.max(jnp.abs(xi_d)) + jnp.max(jnp.abs(xi_p)) + 1)
        out[sweeps] = max(float(jnp.max(jnp.abs(rd))),
                          float(jnp.max(jnp.abs(rp)))) / scale
    return out


def batched_bench(prec, extra_refinement=0, nb=2048, m=48, n=96):
    import bench

    raws = bench.make_raw_instances(nb, m, n)
    jax.config.update("jax_default_matmul_precision", prec)
    try:
        t0 = time.time()
        stats = bench.bench_tpu(raws, dtype="float32", tol=bench.TOL)
        return stats
    finally:
        jax.config.update("jax_default_matmul_precision", "highest")


def main():
    log("devices:", jax.devices())
    results = {}

    for prec in ("highest", "high"):
        dt, fl = mfu_point(prec)
        results[f"mfu_{prec}_ms"] = round(dt * 1e3, 2)
        results[f"mfu_{prec}_gflops"] = round(fl / dt / 1e9, 0)
        log(f"m=8192 dense K1 f32 [{prec}]: {dt*1e3:.1f} ms "
            f"({fl/dt/1e9:.0f} GFLOP/s)")

    for prec in ("highest", "high"):
        res = residual_sweeps(prec)
        results[f"resid_{prec}"] = {k: float(f"{v:.3e}")
                                    for k, v in res.items()}
        log(f"m=2048 residual by sweeps [{prec}]: "
            + ", ".join(f"{k}: {v:.2e}" for k, v in res.items()))

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
