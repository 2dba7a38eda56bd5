"""Extended-precision K1 backend: f64 factorization + double-double
iterative refinement.

Plays the role of the reference's any-precision (BigFloat) linear-algebra
path (reference: src/KKT/LDLFactorizations/ldlfact.jl, exercised by
test/runtests.jl:9): when the KKT system's condition number approaches
1/eps(f64) — which AΘAᵀ does as μ→0, cond ~ μ⁻² — plain f64 solves lose
all forward accuracy. TPUs have no BigFloat; the TPU-native answer is
**mixed-precision refinement one level up**: factorize in f64, compute
refinement residuals in double-word (f64×2, ~106-bit) arithmetic
(:mod:`tulip_tpu.ops.doubledouble`). By classical refinement theory
(Wilkinson; Demmel et al.), residuals in precision u² make the forward
error of the corrected solution ~u, *independent of cond(K)* (while plain
working-precision refinement stalls at cond(K)·u). This is what lets the
IPM hold tolerances near 1e-13 instead of the √eps ≈ 1.5e-8 default.

The dd residual is two broadcasted error-free products plus a log₂(n)
compensated tree sum — fully vectorized, no scalar loops, jit/vmap-safe.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops import doubledouble as dd
from .dense import DenseK1Backend, DenseK1State


@dataclasses.dataclass(frozen=True)
class ExtendedK1Backend(DenseK1Backend):
    """Dense K1 Cholesky with double-double-residual refinement.

    ``refinement_steps`` here counts dd-residual sweeps (default 2; one
    sweep already restores ~u forward error when cond(K)·u < 1, the second
    covers the regime cond(K) ≈ 1/u where the first correction is still
    contaminated).
    """

    name = "extended"
    systems = ("K1",)
    refinement_steps: int = 2

    def arithmetic(self, state) -> str:
        return f"{state.A.dtype} + double-double refinement"

    def arithmetic_label(self, dtype) -> str:
        import numpy as np
        return f"{np.dtype(dtype).name} + double-double refinement"

    def _dd_residuals(self, state: DenseK1State, xi_p, xi_d, dx, dy):
        """Augmented-system residuals in double-word precision:
        rd = ξd + (Θ⁻¹+Rp)∘dx − Aᵀdy ;  rp = ξp − A dx − Rd∘dy."""
        A = state.A
        rd = dd.sub(dd.add(dd.from_f(xi_d),
                           dd.ewmul_vec(state.theta_reg, dx)),
                    dd.matvec(A.T, dy))
        rp = dd.sub(dd.sub(dd.from_f(xi_p), dd.matvec(A, dx)),
                    dd.ewmul_vec(state.regD, dy))
        return dd.to_f(rp), dd.to_f(rd)

    def solve(self, state: DenseK1State, xi_p, xi_d):
        if state.A.dtype != jnp.float64:
            raise TypeError(
                "extended backend requires float64 data (enable jax x64); "
                f"got {state.A.dtype}")
        dx, dy = self._base_solve(state, xi_p, xi_d)
        for _ in range(self.refinement_steps):
            rp, rd = self._dd_residuals(state, xi_p, xi_d, dx, dy)
            ddx, ddy = self._base_solve(state, rp, rd)
            dx = dx + ddx
            dy = dy + ddy
        return dx, dy
