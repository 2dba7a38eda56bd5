"""Pallas TPU kernels for the K1 backend's hot ops.

The per-iteration cost of the IPM is dominated by forming and factorizing the
normal-equations matrix ``K = A D Aᵀ + Rd`` (reference profile:
src/IPM/HSD/step.jl:37 — one factorization + a few backsolves per
iteration). On TPU, forming K is a scaled Gram matmul — pure MXU work. This
module provides a fused Pallas kernel that computes::

    K[i, j] = sum_k A[i, k] * d[k] * A[j, k]   (+ regD[i] on the diagonal)

in one pass (no materialized ``A * sqrt(d)`` temporary, no second read of A
from HBM for the transpose side), plus a backend that uses it.

f64 is not natively supported by the TPU MXU, so the Pallas path engages for
f32/bf16 inputs; f64 falls back to the XLA path of ``DenseK1Backend``
(which is what Tulip-parity 1e-8 runs use).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense import DenseK1Backend, DenseK1State


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scaled_gram_kernel(ai_ref, aj_ref, d_ref, out_ref):
    """One (BM, BM) tile of K = A diag(d) Aᵀ, accumulated over k-tiles."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ai = ai_ref[:] * d_ref[:]          # (BM, BK) * (1, BK) broadcast
    out_ref[:] += jax.lax.dot_general(
        ai, aj_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=out_ref.dtype,
    )


@functools.partial(jax.jit, static_argnames=("bm", "bk", "interpret"))
def scaled_gram(A: jnp.ndarray, d: jnp.ndarray, bm: int = 256, bk: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """K = A @ diag(d) @ A.T via a fused Pallas matmul.

    Pads to tile multiples host-side (zero columns contribute nothing to the
    Gram product; padded rows produce padded K rows that the caller slices
    off).
    """
    m, n = A.shape
    mp, np_ = _round_up(m, bm), _round_up(n, bk)
    Ap = jnp.pad(A, ((0, mp - m), (0, np_ - n)))
    dp = jnp.pad(d, (0, np_ - n)).reshape(1, np_)

    grid = (mp // bm, mp // bm, np_ // bk)
    out = pl.pallas_call(
        _scaled_gram_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, mp), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bk), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, bk), lambda i, j, k: (0, k)),
        ],
        out_specs=pl.BlockSpec((bm, bm), lambda i, j, k: (i, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * mp * np_ + mp * np_,
            bytes_accessed=(2 * mp * np_ + np_ + mp * mp) * A.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Ap, Ap, dp)
    return out[:m, :m]


@dataclasses.dataclass(frozen=True)
class PallasSmallK1Backend(DenseK1Backend):
    """K1 backend for small/batched instances: fused Pallas
    Cholesky + triangular-inverse kernel (``ops.chol``), GEMV-only solves.

    The per-instance normal-equations matrix stays in VMEM; the
    factorization runs as m vectorized rank-1 steps and the factor inverse
    as m MXU matvecs, replacing XLA's batched Cholesky + per-RHS
    sequential triangular solves. Off-TPU (or f64) falls back to the XLA
    inv-factor path.
    """

    name = "pallas-small"
    inv_factor: bool = True
    interpret: bool = False  # run kernel in interpreter mode (CPU tests)
    # Use the fully fused solve kernel (ops/solve.py). Off by default:
    # measured 8.6k vs 15.8k solves/s on the 2048-LP bench on this image's
    # relay platform, whose in-program Pallas DMA streams run far below
    # the standalone rate; on directly attached hardware the fused path
    # trades ~10 XLA ops per refined solve for one kernel.
    fused_solve: bool = False

    def _use_pallas(self, dtype, m) -> bool:
        if self.interpret:
            return True
        if dtype not in (jnp.float32, jnp.bfloat16):
            return False
        return jax.default_backend() == "tpu" and m <= 1024

    def update(self, state, theta_inv, regP, regD):
        from ..ops import cholesky_inverse_pallas

        A = state.A
        m = A.shape[0]
        if not self._use_pallas(A.dtype, m):
            # inv_factor=True by class default -> XLA inverse-factor path.
            return DenseK1Backend.update(self, state, theta_inv, regP, regD)
        theta_reg = theta_inv + regP
        d = 1.0 / theta_reg
        B = A * jnp.sqrt(d)[None, :]
        K = B @ B.T + jnp.diag(regD)
        Linv = cholesky_inverse_pallas(K, interpret=self.interpret)
        ok = jnp.all(jnp.isfinite(Linv))
        Linv = jnp.where(ok, Linv, jnp.eye(m, dtype=K.dtype))
        if self.explicit_minv:
            Linv = Linv.T @ Linv
        from .dense import DenseK1State
        return (DenseK1State(A=A, d=d, theta_reg=theta_reg, regD=regD,
                             L=Linv), ok)

    def _base_solve(self, state, xi_p, xi_d):
        A, d, Li = state.A, state.d, state.L
        rhs = xi_p + A @ (d * xi_d)
        dy = Li @ rhs if self.explicit_minv else Li.T @ (Li @ rhs)
        dx = d * (A.T @ dy - xi_d)
        return dx, dy

    def solve(self, state, xi_p, xi_d):
        """Optionally fused solve: RHS assembly + L⁻¹/L⁻ᵀ + dx recovery +
        refinement sweeps as ONE Pallas op per batch block (the XLA chain
        is 4+ ops per solve). Enabled by ``fused_solve=True``; falls back
        to the XLA inverse-factor path off-TPU or for f64."""
        A = state.A
        if not (self.fused_solve
                and self._use_pallas(A.dtype, A.shape[0])):
            return DenseK1Backend.solve(self, state, xi_p, xi_d)
        from ..ops.solve import fused_k1_solve
        return fused_k1_solve(A, state.L, state.d, state.theta_reg,
                              state.regD, xi_p, xi_d,
                              refine=self.refinement_steps,
                              interpret=self.interpret)


@dataclasses.dataclass(frozen=True)
class PallasK1Backend(DenseK1Backend):
    """K1 backend whose Gram assembly runs as a fused Pallas kernel.

    Falls back to the XLA path for f64 (no MXU f64) or when not running on
    TPU hardware.
    """

    name = "dense-pallas"
    bm: int = 256
    bk: int = 256

    def _use_pallas(self, dtype) -> bool:
        if dtype not in (jnp.float32, jnp.bfloat16):
            return False
        return jax.default_backend() == "tpu"

    def update(self, state: DenseK1State, theta_inv, regP, regD):
        A = state.A
        if not self._use_pallas(A.dtype):
            return super().update(state, theta_inv, regP, regD)
        theta_reg = theta_inv + regP
        d = 1.0 / theta_reg
        K = scaled_gram(A, d, bm=self.bm, bk=self.bk)
        K = K + jnp.diag(regD)
        L = jnp.linalg.cholesky(K)
        ok = jnp.all(jnp.isfinite(L))
        L = jnp.where(ok, L, jnp.eye(K.shape[-1], dtype=K.dtype))
        return (DenseK1State(A=A, d=d, theta_reg=theta_reg, regD=regD, L=L),
                ok)
