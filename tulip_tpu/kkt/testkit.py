"""Generic KKT backend conformance test kit.

Shipped inside the package (not under tests/) so third-party backends can
self-verify against the augmented-system contract, mirroring the
reference's ``KKT.run_ls_tests`` (reference: src/KKT/Test/test.jl:9-47).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def run_ls_tests(A, backend, atol: float = None) -> None:
    """Assert that ``backend`` satisfies the setup/update/solve contract on
    matrix ``A``: after ``update`` with unit θ⁻¹ and regularizations, the
    solution of the augmented system with unit right-hand sides has residual
    norms below ``atol``."""
    A = jnp.asarray(A)
    m, n = A.shape
    dt = A.dtype
    if atol is None:
        atol = float(np.sqrt(np.finfo(np.dtype(dt.name)).eps)) * 10

    state = backend.setup(A)

    theta_inv = jnp.ones(n, dtype=dt)
    regP = jnp.ones(n, dtype=dt)
    regD = jnp.ones(m, dtype=dt)
    state, ok = backend.update(state, theta_inv, regP, regD)
    assert bool(ok), f"{backend.name}: update failed on a benign system"

    xi_p = jnp.ones(m, dtype=dt)
    xi_d = jnp.ones(n, dtype=dt)
    dx, dy = backend.solve(state, xi_p, xi_d)

    # Augmented-system residuals (reference: test.jl:33-44):
    #   rd = ξd + (Θ⁻¹+Rp) dx - Aᵀ dy ;  rp = ξp - A dx - Rd dy
    rd = xi_d - (-(theta_inv + regP) * dx + A.T @ dy)
    rp = xi_p - (A @ dx + regD * dy)
    rd_nrm = float(jnp.max(jnp.abs(rd)))
    rp_nrm = float(jnp.max(jnp.abs(rp)))
    assert rd_nrm <= atol, (
        f"{backend.name}: dual residual {rd_nrm:.3e} > {atol:.3e}")
    assert rp_nrm <= atol, (
        f"{backend.name}: primal residual {rp_nrm:.3e} > {atol:.3e}")
