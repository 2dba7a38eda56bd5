"""Pallas Cholesky kernels for VMEM-resident matrices.

Why: XLA's TPU Cholesky is tuned for large matrices; for the IPM's batched
scenario workloads the per-instance normal-equations matrices are tiny
(m ≤ a few hundred), and the batched factorization degenerates into long
sequences of small ops. These kernels keep the whole matrix in VMEM and
run the factorization as m vectorized rank-1 steps on the VPU/MXU, with
``jax.vmap`` batching into a grid over instances via Pallas's batching
rule.

Layout trick: we compute the UPPER factor U (K = UᵀU) row by row so the
running index j walks the SUBLANE dimension; Mosaic has no dynamic_slice
on values, so U lives in a VMEM scratch ref and rows are read/written with
``pl.ds`` (ref-based dynamic slicing IS supported). Lane-indexed pivot
extraction uses a one-hot reduction. The (m,1)·(1,m) outer product of the
trailing update is a k=1 MXU dot; the triangular-inverse phase is one
(1,m)·(m,m) MXU matvec per row.

Failure signalling: a non-positive pivot turns into NaN/Inf via rsqrt and
propagates; callers detect it with the same ``isfinite`` check used for
the XLA path (no exceptions in kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_phase(K_ref, U_ref):
    """In-place upper-Cholesky of K into U_ref: K = UᵀU."""
    m = K_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)

    U_ref[:] = K_ref[:]

    def body(j, _):
        row = U_ref[pl.ds(j, 1), :]                               # (1, m)
        one = jnp.ones_like(row)
        onehot = jnp.where(lane == j, one, jnp.zeros_like(row))
        pivot2 = jnp.sum(row * onehot)
        # NOTE: lax.rsqrt lowers to an approximate VPU rsqrt in Mosaic;
        # use exact sqrt + divide (pivot accuracy bounds factor accuracy).
        inv_pivot = 1.0 / jnp.sqrt(pivot2)
        urow = jnp.where(lane >= j, row * inv_pivot,
                         jnp.zeros_like(row))
        U_ref[pl.ds(j, 1), :] = urow
        # Trailing rank-1 update on rows > j.
        outer = jax.lax.dot_general(
            urow, urow, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=row.dtype)                     # (m, m)
        U = U_ref[:]
        U_ref[:] = jnp.where(rows > j, U - outer, U)
        return 0

    jax.lax.fori_loop(0, m, body, 0)


def _chol_kernel(K_ref, L_ref, U_scratch):
    m = K_ref.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    _chol_phase(K_ref, U_scratch)
    U = U_scratch[:]
    L_ref[:] = jnp.where(cols >= rows, U, jnp.zeros_like(U)).T


def _chol_inv_kernel(K_ref, Linv_ref, U_scratch):
    """Fused Cholesky + triangular inverse: K = UᵀU, output L⁻¹ = U⁻ᵀ.

    Second phase: rows of X = U⁻¹ bottom-up; each step is one (1,m)·(m,m)
    MXU matvec — O(m³) total at much better utilization than per-RHS
    backsolves.
    """
    m = K_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    _chol_phase(K_ref, U_scratch)

    Linv_ref[:] = jnp.zeros_like(Linv_ref)

    def inv_body(jj, _):
        j = m - 1 - jj
        urow = U_scratch[pl.ds(j, 1), :]                          # (1, m)
        onehot = jnp.where(lane == j, jnp.ones_like(urow),
                           jnp.zeros_like(urow))
        pivot = jnp.sum(urow * onehot)
        umask = jnp.where(lane > j, urow, jnp.zeros_like(urow))
        acc = jax.lax.dot_general(
            umask, Linv_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=urow.dtype)                    # (1, m)
        Linv_ref[pl.ds(j, 1), :] = (onehot - acc) / pivot
        return 0

    jax.lax.fori_loop(0, m, inv_body, 0)
    Linv_ref[:] = Linv_ref[:].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_pallas(K: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix (batch via vmap).

    ``K`` must fit in VMEM ((m, m) with m up to ~1024 in f32).
    """
    m = K.shape[-1]
    # Trace the kernel with x64 off: the package enables x64 globally, which
    # promotes loop-index arithmetic to i64 — unsupported by the Mosaic TPU
    # lowering (infinite recursion in convert_element_type).
    with jax.enable_x64(False):
        return pl.pallas_call(
            _chol_kernel,
            out_shape=jax.ShapeDtypeStruct(K.shape, K.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m, m), K.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=int(7 * m * m * m // 3),
                bytes_accessed=2 * m * m * K.dtype.itemsize,
                transcendentals=m,
            ),
            interpret=interpret,
        )(K)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_inverse_pallas(K: jnp.ndarray, interpret: bool = False,
                            ) -> jnp.ndarray:
    """Inverse lower Cholesky factor L⁻¹ with K = L Lᵀ (batch via vmap).

    Solves of ``K x = r`` become ``x = L⁻ᵀ (L⁻¹ r)`` — two GEMVs.
    A non-SPD input yields NaN/Inf (detect with ``isfinite``).
    """
    m = K.shape[-1]
    with jax.enable_x64(False):
        return pl.pallas_call(
            _chol_inv_kernel,
            out_shape=jax.ShapeDtypeStruct(K.shape, K.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m, m), K.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=int(3 * m * m * m),
                bytes_accessed=2 * m * m * K.dtype.itemsize,
                transcendentals=m,
            ),
            interpret=interpret,
        )(K)
