"""Two-stage stochastic LP with the distributed Schur-complement backend.

Shards scenario blocks over all available devices (run tests/conftest-style
with XLA_FLAGS=--xla_force_host_platform_device_count=8 to see a multi-
device mesh on CPU). No reference analogue (SURVEY §2.6).
"""

import numpy as np

import tulip_tpu  # noqa: F401
import jax
from jax.sharding import Mesh
from tulip_tpu.ipm.hsd import HSDOptions, hsd_solve_device
from tulip_tpu.kkt import SchurK1Backend
from tulip_tpu.parallel import make_block_angular, shard_scenarios


def main():
    rng = np.random.default_rng(0)
    K, m0, n0, mk, nk = 16, 4, 8, 5, 10
    A0 = rng.standard_normal((m0, n0))
    T = rng.standard_normal((K, mk, n0))
    W = rng.standard_normal((K, mk, nk))
    u0 = rng.uniform(1, 3, n0)
    uk = rng.uniform(1, 3, (K, nk))
    x0 = u0 * 0.5
    xs = uk * 0.5
    ba = make_block_angular(
        A0, A0 @ x0, rng.standard_normal(n0), T, W,
        np.einsum("kij,j->ki", T, x0) + np.einsum("kij,kj->ki", W, xs),
        rng.standard_normal((K, nk)),
        np.zeros(n0 + K * nk), np.concatenate([u0, uk.reshape(-1)]))

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("scen",))
    print(f"devices: {len(devs)}; scenarios: {K}")
    ba = shard_scenarios(ba, mesh)

    out = hsd_solve_device(SchurK1Backend(), HSDOptions(), ba)
    print(f"status={int(out.status)} iterations={int(out.niter)} "
          f"objective={float(out.pobj):.8f}")


if __name__ == "__main__":
    main()
