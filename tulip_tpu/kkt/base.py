"""KKT backend base class: the setup/update/solve contract."""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KKTBackend:
    """Immutable static configuration for a KKT solver backend.

    Subclasses define ``name`` / ``systems`` class attrs and implement
    ``setup`` / ``update`` / ``solve``. Instances are hashable (frozen
    dataclass) so jit treats them as static.

    ``refinement_steps``: fixed count of iterative-refinement sweeps applied
    after each solve. The reference leaves refinement as a TODO
    (reference: src/KKT/Dense/lapack.jl:117); on TPU it is what lets
    f32 runs approach f64-grade residuals.
    """

    refinement_steps: int = 0

    name = "abstract"
    systems: Tuple[str, ...] = ()
    # Experimental backends pass the conformance kit but are NOT validated
    # for full 1e-8 end-to-end solves; make_backend warns on instantiation.
    experimental = False
    # Gate for the conformance kit's late-IPM ill-conditioning sweeps
    # (kkt/testkit.py): max scale-aware relative residual on the
    # 16-decade θ sweep. Direct methods hold ≤ ~3e-7 measured; None opts
    # out (matrix-free backends, validated end-to-end instead).
    sweep_resid_atol = 1e-6

    # -- introspection (reference: src/KKT/KKT.jl:103-121) ---------------
    def arithmetic(self, state) -> str:
        return "unknown"

    def arithmetic_label(self, dtype) -> str:
        """Label for the solver-header log; backends that compute in a
        different effective precision than the data dtype override this."""
        import numpy as np
        return np.dtype(dtype).name

    def linear_system(self) -> str:
        return self.systems[0] if self.systems else "unknown"

    # -- contract --------------------------------------------------------
    def setup(self, A: jnp.ndarray) -> Any:
        raise NotImplementedError

    def setup_data(self, dat) -> Any:
        """Build solver state from LP data. Default: dense constraint
        matrix. Structured backends (block-angular Schur) override to read
        their structured fields."""
        return self.setup(dat.A)

    def update(self, state: Any, theta_inv: jnp.ndarray,
               regP: jnp.ndarray, regD: jnp.ndarray) -> Tuple[Any, jnp.ndarray]:
        raise NotImplementedError

    def solve(self, state: Any, xi_p: jnp.ndarray,
              xi_d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def solve_unrefined(self, state: Any, xi_p: jnp.ndarray,
                        xi_d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Solve WITHOUT the backend's iterative-refinement sweeps, for
        callers that tolerate lower accuracy (e.g. the IPM's FastPredictor
        option). Falls back to the full solve when the backend has no
        base/refine split."""
        base = getattr(self, "_base_solve", None)
        if base is None:
            return self.solve(state, xi_p, xi_d)
        return base(state, xi_p, xi_d)

    # -- shared refinement helper ---------------------------------------
    def _refine(self, state, xi_p, xi_d, dx, dy, base_solve):
        """Iterative refinement on the augmented system.

        Residuals: rd = ξd - (-(Θ⁻¹+Rp)dx + Aᵀdy), rp = ξp - (A dx + Rd dy);
        correction solved with the existing factorization.
        """
        for _ in range(self.refinement_steps):
            rd = xi_d - (-(state.theta_reg * dx) + state.A.T @ dy)
            rp = xi_p - (state.A @ dx + state.regD * dy)
            ddx, ddy = base_solve(state, rp, rd)
            dx = dx + ddx
            dy = dy + ddy
        return dx, dy
