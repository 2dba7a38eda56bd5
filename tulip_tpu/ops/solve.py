"""Fused K1 solve kernel: the whole inverse-factor backsolve chain —
RHS assembly, L⁻¹/L⁻ᵀ applications, dx recovery, and iterative-refinement
sweeps — as ONE Pallas op per batch block.

Why: the batched IPM's per-iteration wall-clock on the target platform is
bound by the NUMBER of device ops, not FLOPs (see BASELINE.md "platform
characterization": ~0.5 ms fixed latency per dependent in-program op).
One Newton solve on the XLA path is 4 big ops (A·(dξd), L⁻¹r, L⁻ᵀw,
Aᵀdy) and a refinement sweep ~6 more; an HSD iteration runs 3–6 solves.
Fusing each refined solve into a single kernel removes most of those
barriers.

Mosaic design notes (same constraints as ops/chol.py):
- All contractions are VPU broadcast-multiply + reductions in exact f32
  (MXU dots run at bf16 input precision).
- Vectors alternate between lane form (nb, 1, k) and sublane form
  (nb, k, 1) as the reductions dictate; the two relayouts per solve are
  done with identity-mask multiply-reduce (no Mosaic transpose).
- Batched under ``jax.custom_batching.custom_vmap``: the unbatched call
  runs a 1-instance block; under vmap the batch is blocked into grid
  cells (mirrors ``cholesky_inverse_pallas``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_solve_kernel(refine: int, A_ref, Li_ref, d_ref, treg_ref,
                        regD_ref, xip_ref, xid_ref, dx_ref, dy_ref):
    """One block: solve the augmented system via the normal equations
    with the precomputed inverse factor Li = L⁻¹ (K = L Lᵀ = A D Aᵀ + Rd):

        rhs = ξp + A (d ⊙ ξd);  dy = L⁻ᵀ L⁻¹ rhs;  dx = d ⊙ (Aᵀ dy − ξd)

    plus ``refine`` augmented-system refinement sweeps, fully VMEM-resident.
    """
    A = A_ref[:]                 # (nb, m, n)
    Li = Li_ref[:]               # (nb, m, m)
    d = d_ref[:]                 # (nb, 1, n)
    treg = treg_ref[:]           # (nb, 1, n)
    regD = regD_ref[:]           # (nb, 1, m)
    xip_l = xip_ref[:]           # (nb, 1, m)
    xid_l = xid_ref[:]           # (nb, 1, n)
    m = A.shape[1]
    dt = A.dtype

    # Identity masks for lane<->sublane vector relayout by multiply-reduce.
    eye_m = jnp.asarray(
        jax.lax.broadcasted_iota(jnp.int32, (1, m, m), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (1, m, m), 2), dt)

    def l2s(x_l):                # (nb, 1, m) -> (nb, m, 1)
        return jnp.sum(eye_m * x_l, axis=-1, keepdims=True)

    def s2l(x_s):                # (nb, m, 1) -> (nb, 1, m)
        return jnp.sum(eye_m * x_s, axis=1, keepdims=True)

    def base_solve(xi_p_l, xi_d_l):
        t = d * xi_d_l                                     # (nb, 1, n)
        rhs_s = jnp.sum(A * t, axis=-1, keepdims=True) + l2s(xi_p_l)
        rhs_l = s2l(rhs_s)
        w_s = jnp.sum(Li * rhs_l, axis=-1, keepdims=True)  # L⁻¹ rhs
        dy_l = jnp.sum(Li * w_s, axis=1, keepdims=True)    # L⁻ᵀ w
        dy_s = l2s(dy_l)
        atdy_l = jnp.sum(A * dy_s, axis=1, keepdims=True)  # (nb, 1, n)
        dx_l = d * (atdy_l - xi_d_l)
        return dx_l, dy_l, dy_s, atdy_l

    dx_l, dy_l, dy_s, atdy_l = base_solve(xip_l, xid_l)

    for _ in range(refine):
        # Augmented residuals: rd = ξd − (−(Θ⁻¹+Rp)dx + Aᵀdy),
        #                      rp = ξp − (A dx + Rd dy).
        rd_l = xid_l - (-(treg * dx_l) + atdy_l)
        adx_s = jnp.sum(A * dx_l, axis=-1, keepdims=True)  # (nb, m, 1)
        rp_l = xip_l - (s2l(adx_s) + regD * dy_l)
        ddx_l, ddy_l, _, datdy_l = base_solve(rp_l, rd_l)
        dx_l = dx_l + ddx_l
        dy_l = dy_l + ddy_l
        atdy_l = atdy_l + datdy_l

    dx_ref[:] = dx_l
    dy_ref[:] = dy_l


def _pick_block(B: int, m: int, n: int, itemsize: int) -> int:
    """Largest power-of-two block whose ~10 live (nb, m, n)-class buffers,
    lane-padded to 128, fit in ~10 MB of VMEM."""
    width = max(-(-n // 128) * 128, -(-m // 128) * 128)
    bytes_per = m * width * itemsize
    budget = max(1, 10 * 1024 * 1024 // (10 * bytes_per))
    nb = 1
    while nb * 2 <= min(B, budget):
        nb *= 2
    return nb


@functools.partial(jax.jit,
                   static_argnames=("refine", "block", "interpret"))
def batched_fused_k1_solve(A, Li, d, treg, regD, xi_p, xi_d,
                           refine: int = 0, block: int = 0,
                           interpret: bool = False):
    """Batched fused solve: inputs carry a leading batch dim B.

    A (B,m,n), Li (B,m,m), d/treg (B,n), regD (B,m), xi_p (B,m),
    xi_d (B,n) → (dx (B,n), dy (B,m)).
    """
    B, m, n = A.shape
    dt = A.dtype
    nb = block or _pick_block(B, m, n, dt.itemsize)
    B_pad = -(-B // nb) * nb
    if B_pad != B:
        pad = B_pad - B
        A = jnp.concatenate([A, jnp.zeros((pad, m, n), dt)])
        Li = jnp.concatenate(
            [Li, jnp.broadcast_to(jnp.eye(m, dtype=dt), (pad, m, m))])
        d = jnp.concatenate([d, jnp.ones((pad, n), dt)])
        treg = jnp.concatenate([treg, jnp.ones((pad, n), dt)])
        regD = jnp.concatenate([regD, jnp.ones((pad, m), dt)])
        xi_p = jnp.concatenate([xi_p, jnp.zeros((pad, m), dt)])
        xi_d = jnp.concatenate([xi_d, jnp.zeros((pad, n), dt)])

    vecs = (d.reshape(B_pad, 1, n), treg.reshape(B_pad, 1, n),
            regD.reshape(B_pad, 1, m), xi_p.reshape(B_pad, 1, m),
            xi_d.reshape(B_pad, 1, n))
    with jax.enable_x64(False):
        dx, dy = pl.pallas_call(
            functools.partial(_fused_solve_kernel, refine),
            out_shape=(jax.ShapeDtypeStruct((B_pad, 1, n), dt),
                       jax.ShapeDtypeStruct((B_pad, 1, m), dt)),
            grid=(B_pad // nb,),
            in_specs=[
                pl.BlockSpec((nb, m, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, m, m), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, m), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, m), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((nb, 1, n), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((nb, 1, m), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            cost_estimate=pl.CostEstimate(
                flops=int((1 + refine) * B_pad
                          * (4 * m * n + 4 * m * m)),
                bytes_accessed=(B_pad * (m * n + m * m + 3 * n + 4 * m)
                                * dt.itemsize),
                transcendentals=0,
            ),
            interpret=interpret,
        )(A, Li, *vecs)
    return dx.reshape(B_pad, n)[:B], dy.reshape(B_pad, m)[:B]


def _make_fused_solve(refine: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def solve(A, Li, d, treg, regD, xi_p, xi_d):
        dx, dy = batched_fused_k1_solve(
            A[None], Li[None], d[None], treg[None], regD[None],
            xi_p[None], xi_d[None], refine=refine, block=1,
            interpret=interpret)
        return dx[0], dy[0]

    @solve.def_vmap
    def _rule(axis_size, in_batched, A, Li, d, treg, regD, xi_p, xi_d):
        assert all(in_batched)
        lead = A.shape[:-2]
        out = batched_fused_k1_solve(
            A.reshape((-1,) + A.shape[-2:]),
            Li.reshape((-1,) + Li.shape[-2:]),
            d.reshape((-1, d.shape[-1])),
            treg.reshape((-1, treg.shape[-1])),
            regD.reshape((-1, regD.shape[-1])),
            xi_p.reshape((-1, xi_p.shape[-1])),
            xi_d.reshape((-1, xi_d.shape[-1])),
            refine=refine, interpret=interpret)
        dx = out[0].reshape(lead + (d.shape[-1],))
        dy = out[1].reshape(lead + (regD.shape[-1],))
        return (dx, dy), (True, True)

    return solve


_FUSED = {}


def fused_k1_solve(A, Li, d, treg, regD, xi_p, xi_d, refine: int = 0,
                   interpret: bool = False):
    """Single-instance entry that batches efficiently under ``jax.vmap``
    (one blocked kernel launch for the whole batch)."""
    key = (refine, interpret)
    if key not in _FUSED:
        _FUSED[key] = _make_fused_solve(refine, interpret)
    if A.ndim == 2:
        return _FUSED[key](A, Li, d, treg, regD, xi_p, xi_d)
    return batched_fused_k1_solve(A, Li, d, treg, regD, xi_p, xi_d,
                                  refine=refine, interpret=interpret)
