"""Scenario-batched solving: many LPs in one vmapped solve.

No reference analogue — this is the TPU-native scaling axis (SURVEY §2.6).
"""

import numpy as np

import tulip_tpu  # noqa: F401  (enables x64)
import jax.numpy as jnp
from tulip_tpu.ipm.batch import batched_hsd_solve, stack_lps
from tulip_tpu.ipm.data import make_lp_data
from tulip_tpu.ipm.hsd import HSDOptions
from tulip_tpu.kkt import DenseK1Backend


def main():
    rng = np.random.default_rng(0)
    lps = []
    for _ in range(32):
        A = rng.standard_normal((6, 12))
        u = rng.uniform(1, 4, 12)
        x0 = u * rng.uniform(0.2, 0.8, 12)
        lps.append(make_lp_data(A, A @ x0, rng.standard_normal(12), 0.0,
                                np.zeros(12), u, dtype=jnp.float64))

    out = batched_hsd_solve(DenseK1Backend(), HSDOptions(), stack_lps(lps))
    st = np.asarray(out.status)
    print(f"optimal: {(st == 2).sum()}/32, "
          f"mean iterations {np.asarray(out.niter).mean():.1f}")
    print("objectives:", np.round(np.asarray(out.pobj), 4))


if __name__ == "__main__":
    main()
