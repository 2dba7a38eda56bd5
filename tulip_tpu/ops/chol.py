"""Pallas Cholesky kernels for VMEM-resident matrices.

Why: XLA's TPU Cholesky is tuned for large matrices; for the IPM's batched
scenario workloads the per-instance normal-equations matrices are tiny
(m ≤ a few hundred). These kernels process a BLOCK of instances per grid
cell so every one of the m factorization steps is a wide (nb·m-lane) VPU
op — batching a per-instance kernel through vmap's default rule would
instead serialize tiny 1-sublane ops per instance (measured 6x slower
than XLA; the blocked kernel is the fix).

Mosaic constraints shaping the design (see memory: mosaic-pallas-pitfalls):
- no `dynamic_slice` on values → the working matrices live in VMEM scratch
  refs, rows indexed with `ref[:, pl.ds(j, 1), :]`;
- MXU dots execute at bf16 input precision regardless of the requested
  precision → all contractions are VPU broadcast-multiply + reductions
  (exact f32);
- lane-dimension dynamic indexing is avoided: pivot/column extraction uses
  one-hot lane masks and reductions; the triangular inverse is built as
  L⁻¹ rows top-down so no transpose is ever materialized;
- `lax.rsqrt` is approximate → exact `1/sqrt`;
- kernels trace with x64 disabled (i64 index promotion breaks lowering).

``cholesky_inverse_pallas`` is a ``jax.custom_batching.custom_vmap``: the
unbatched call runs a 1-instance block; under vmap the whole batch is
blocked into grid cells.

Failure signalling: a non-positive pivot turns into NaN/Inf via 1/sqrt and
propagates; callers detect it with the same ``isfinite`` check used for
the XLA path (no exceptions in kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _batched_chol_inv_kernel(K_ref, Linv_ref, S_ref, U_ref):
    """One block of instances: K (nb, m, m) → L⁻¹ (nb, m, m).

    Phase 1: upper factor U (K = UᵀU) via right-looking rank-1 updates on
    the symmetric trailing matrix S; the column needed for the outer
    product is extracted from S by symmetry with a lane-mask reduction
    (no transpose).
    Phase 2: rows of L⁻¹ top-down by forward substitution; L's row i is
    U's column i, again extracted by lane-mask reduction.
    """
    m = K_ref.shape[-1]
    dt = K_ref.dtype
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    subl3 = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    ones_l = jnp.ones((1, 1, m), dt)
    zeros_l = jnp.zeros((1, 1, m), dt)

    S_ref[:] = K_ref[:]

    def chol_body(j, _):
        srow = S_ref[:, pl.ds(j, 1), :]                   # (nb, 1, m)
        onehot = jnp.where(lane3 == j, ones_l, zeros_l)   # (1, 1, m)
        pivot2 = jnp.sum(srow * onehot, axis=-1, keepdims=True)
        invp = 1.0 / jnp.sqrt(pivot2)                     # (nb, 1, 1)
        urow = jnp.where(lane3 >= j, srow * invp, jnp.zeros_like(srow))
        U_ref[:, pl.ds(j, 1), :] = urow
        # Column j of S (rows > j valid by symmetry) via lane reduction.
        scol = jnp.sum(S_ref[:] * onehot, axis=-1, keepdims=True)
        ucol = scol * invp                                # (nb, m, 1)
        outer = ucol * urow                               # (nb, m, m)
        S = S_ref[:]
        S_ref[:] = jnp.where(subl3 > j, S - outer, S)
        return 0

    jax.lax.fori_loop(0, m, chol_body, 0)

    Linv_ref[:] = jnp.zeros_like(Linv_ref)

    def inv_body(i, _):
        onehot = jnp.where(lane3 == i, ones_l, zeros_l)
        # L[i, :] = U[:, i]: lane-mask reduce U.
        ucol = jnp.sum(U_ref[:] * onehot, axis=-1, keepdims=True)
        pivot = jnp.sum(jnp.where(subl3 == i, ucol, jnp.zeros_like(ucol)),
                        axis=1, keepdims=True)            # (nb, 1, 1)
        contrib = jnp.where(subl3 < i, ucol, jnp.zeros_like(ucol)) \
            * Linv_ref[:]
        acc = jnp.sum(contrib, axis=1, keepdims=True)     # (nb, 1, m)
        Linv_ref[:, pl.ds(i, 1), :] = (onehot - acc) / pivot
        return 0

    jax.lax.fori_loop(0, m, inv_body, 0)


def _packed_chol_inv_kernel(p: int, m: int, K_ref, Linv_ref, S_ref, U_ref):
    """Lane-packed variant: each (nb, m, p·m) block holds p instances
    side-by-side in the lane dimension (instance k in lanes [k·m, (k+1)·m)),
    all sharing the sublane (row) axis. Every VPU op then advances p
    factorizations at once — at m=48 the plain kernel pads 48 lanes to 128
    and wastes 62% of each op; packing p=2 cuts that to 25%.

    Per step, per-instance scalars (pivot, 1/√pivot) are extracted with p
    one-hot lane reductions (p is small and static) and re-broadcast as a
    single lane-packed vector, so the O(m²)-lane rank-1 update and forward
    substitution stay ONE op regardless of p.
    """
    dt = K_ref.dtype
    lanes = K_ref.shape[-1]                       # p*m
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
    subl3 = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    lane_in_g = lane3 % m
    ones_l = jnp.ones((1, 1, lanes), dt)
    zeros_l = jnp.zeros((1, 1, lanes), dt)
    gmask = [jnp.where((lane3 >= k * m) & (lane3 < (k + 1) * m),
                       ones_l, zeros_l) for k in range(p)]

    S_ref[:] = K_ref[:]

    def chol_body(j, _):
        srow = S_ref[:, pl.ds(j, 1), :]                    # (nb, 1, p*m)
        onehot_all = jnp.where(lane_in_g == j, ones_l, zeros_l)
        # Per-instance pivots -> one lane-packed 1/sqrt(pivot) vector.
        invp_lanes = jnp.zeros_like(srow)
        ucol_lanes = jnp.zeros((srow.shape[0], m, lanes), dt)
        S = S_ref[:]
        for k in range(p):
            oh_k = onehot_all * gmask[k]
            piv = jnp.sum(srow * oh_k, axis=-1, keepdims=True)  # (nb,1,1)
            ivp = 1.0 / jnp.sqrt(piv)
            invp_lanes = invp_lanes + ivp * gmask[k]
            # Column j of instance k (by symmetry) packed back to lanes.
            scol = jnp.sum(S * oh_k, axis=-1, keepdims=True)    # (nb,m,1)
            ucol_lanes = ucol_lanes + (scol * ivp) * gmask[k]
        urow = jnp.where(lane_in_g >= j, srow * invp_lanes,
                         jnp.zeros_like(srow))
        U_ref[:, pl.ds(j, 1), :] = urow
        outer = ucol_lanes * urow                           # (nb, m, p*m)
        S_ref[:] = jnp.where(subl3 > j, S - outer, S)
        return 0

    jax.lax.fori_loop(0, m, chol_body, 0)

    Linv_ref[:] = jnp.zeros_like(Linv_ref)

    def inv_body(i, _):
        onehot_all = jnp.where(lane_in_g == i, ones_l, zeros_l)
        U = U_ref[:]
        ucol_lanes = jnp.zeros((U.shape[0], m, lanes), dt)
        invpiv_lanes = jnp.zeros((U.shape[0], 1, lanes), dt)
        for k in range(p):
            oh_k = onehot_all * gmask[k]
            ucol = jnp.sum(U * oh_k, axis=-1, keepdims=True)    # (nb,m,1)
            piv = jnp.sum(jnp.where(subl3 == i, ucol,
                                    jnp.zeros_like(ucol)),
                          axis=1, keepdims=True)                # (nb,1,1)
            ucol_lanes = ucol_lanes + ucol * gmask[k]
            invpiv_lanes = invpiv_lanes + (1.0 / piv) * gmask[k]
        contrib = jnp.where(subl3 < i, ucol_lanes,
                            jnp.zeros_like(ucol_lanes)) * Linv_ref[:]
        acc = jnp.sum(contrib, axis=1, keepdims=True)           # (nb,1,p*m)
        Linv_ref[:, pl.ds(i, 1), :] = (onehot_all - acc) * invpiv_lanes
        return 0

    jax.lax.fori_loop(0, m, inv_body, 0)


def _pick_block(B: int, m: int, itemsize: int) -> int:
    """Block size: largest power of two whose ~8 live (nb, m, m) buffers
    (in/out double buffers + 2 scratch), LANE-PADDED to 128, fit in ~10 MB
    of VMEM. Power-of-two/sublane-aligned blocks matter: a 21-sublane block
    took 243 s to compile vs 0.9 s for 32 (measured on v5e)."""
    m_padded_bytes = m * (-(-m // 128) * 128) * itemsize
    budget = max(1, 10 * 1024 * 1024 // (8 * m_padded_bytes))
    nb = 1
    while nb * 2 <= min(B, budget):
        nb *= 2
    return nb


def _pick_block_packed(B: int, m: int, pack: int, itemsize: int) -> int:
    """Same VMEM budget for the lane-packed layout (nb, m, pack·m)."""
    bytes_per = m * (-(-(pack * m) // 128) * 128) * itemsize
    budget = max(1, 10 * 1024 * 1024 // (8 * bytes_per))
    groups = max(1, -(-B // pack))
    nb = 1
    while nb * 2 <= min(groups, budget):
        nb *= 2
    return nb


@functools.partial(jax.jit, static_argnames=("interpret", "block", "pack"))
def batched_cholesky_inverse_pallas(K: jnp.ndarray, block: int = 0,
                                    interpret: bool = False,
                                    pack: int = 0) -> jnp.ndarray:
    """L⁻¹ for a batch of SPD matrices K (B, m, m), K = L Lᵀ.

    The batch is padded up to a multiple of the block size with identity
    matrices (their factor-inverse is identity; sliced off afterwards).
    ``pack`` (0 = auto) lays p instances side-by-side in the lane
    dimension so small-m factorizations don't waste the 128-lane VPU
    width (m=48 plain wastes 62% of every op; p=2 wastes 25%).
    """
    B, m = K.shape[0], K.shape[-1]
    if pack == 0:
        # Default to the unpacked kernel: on this image's remote-tunneled
        # platform a fixed per-HLO-op latency floor (~0.5 ms, measured)
        # makes the pack/unpack transposes a net loss even though packing
        # raises VPU lane utilization from 38% to 75% at m=48. On directly
        # attached hardware pass pack=128//m explicitly.
        pack = 1
    if pack > 1:
        nb = block or _pick_block_packed(B, m, pack, K.dtype.itemsize)
        group = nb * pack
        B_pad = -(-B // group) * group
        if B_pad != B:
            eye = jnp.broadcast_to(jnp.eye(m, dtype=K.dtype),
                                   (B_pad - B, m, m))
            K = jnp.concatenate([K, eye], axis=0)
        G = B_pad // pack
        Kp = K.reshape(G, pack, m, m).transpose(0, 2, 1, 3) \
             .reshape(G, m, pack * m)
        with jax.enable_x64(False):
            out = pl.pallas_call(
                functools.partial(_packed_chol_inv_kernel, pack, m),
                out_shape=jax.ShapeDtypeStruct(Kp.shape, K.dtype),
                grid=(G // nb,),
                in_specs=[pl.BlockSpec((nb, m, pack * m),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((nb, m, pack * m),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((nb, m, pack * m), K.dtype),
                                pltpu.VMEM((nb, m, pack * m), K.dtype)],
                cost_estimate=pl.CostEstimate(
                    flops=int(5 * B_pad * m * m * m),
                    bytes_accessed=2 * B_pad * m * m * K.dtype.itemsize,
                    transcendentals=B_pad * m,
                ),
                interpret=interpret,
            )(Kp)
        Linv = out.reshape(G, m, pack, m).transpose(0, 2, 1, 3) \
                  .reshape(B_pad, m, m)
        return Linv[:B]
    nb = block or _pick_block(B, m, K.dtype.itemsize)
    B_pad = -(-B // nb) * nb
    if B_pad != B:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=K.dtype),
                               (B_pad - B, m, m))
        K = jnp.concatenate([K, eye], axis=0)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _batched_chol_inv_kernel,
            out_shape=jax.ShapeDtypeStruct(K.shape, K.dtype),
            grid=(B_pad // nb,),
            in_specs=[pl.BlockSpec((nb, m, m), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nb, m, m), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nb, m, m), K.dtype),
                            pltpu.VMEM((nb, m, m), K.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=int(5 * B_pad * m * m * m),
                bytes_accessed=2 * B_pad * m * m * K.dtype.itemsize,
                transcendentals=B_pad * m,
            ),
            interpret=interpret,
        )(K)
    return out[:B]


def _make_chol_inv(interpret: bool):
    @jax.custom_batching.custom_vmap
    def chol_inv(K):
        return batched_cholesky_inverse_pallas(K[None], block=1,
                                               interpret=interpret)[0]

    @chol_inv.def_vmap
    def _rule(axis_size, in_batched, K):  # noqa: ANN001
        (k_batched,) = in_batched
        assert k_batched
        # Collapse any extra leading dims into one batch axis.
        lead = K.shape[:-2]
        Kb = K.reshape((-1,) + K.shape[-2:])
        out = batched_cholesky_inverse_pallas(Kb, interpret=interpret)
        return out.reshape(lead + K.shape[-2:]), True

    return chol_inv


_CHOL_INV = {False: _make_chol_inv(False), True: _make_chol_inv(True)}


def cholesky_inverse_pallas(K: jnp.ndarray, interpret: bool = False,
                            ) -> jnp.ndarray:
    """Inverse lower Cholesky factor L⁻¹ with K = L Lᵀ.

    Batches efficiently under ``jax.vmap`` (block-batched grid). Solves of
    ``K x = r`` become ``x = L⁻ᵀ (L⁻¹ r)`` — two GEMVs.
    """
    if K.ndim == 2:
        return _CHOL_INV[interpret](K)
    return batched_cholesky_inverse_pallas(K, interpret=interpret)


def cholesky_pallas(K: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix or batch.

    Convenience wrapper around the fused inverse kernel: returns
    L = (L⁻¹)⁻¹ via one triangular solve against I.
    """
    Li = cholesky_inverse_pallas(K, interpret=interpret)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    return jax.scipy.linalg.solve_triangular(Li, eye, lower=True)
