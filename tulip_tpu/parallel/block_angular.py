"""Block-angular (two-stage stochastic) LP data structure.

The reference has no parallelism framework; its designed-in seam for
structured problems is the pluggable matrix type behind ``construct_matrix``
(reference: src/LinearAlgebra/LinearAlgebra.jl:14-32, src/parameters.jl:11;
NEWS.md notes a former ``UnitBlockAngular`` specialized matrix). This module
makes that seam carry multi-chip parallelism, per the TPU-first design:
the constraint matrix of a two-stage stochastic LP

    min  c0'x0 + Σ_k ck'xk
    s.t. A0 x0                = b0          (first-stage rows, m0)
         Tk x0 + Wk xk        = hk          (scenario rows, K × mk)
         bounds on x0 (n0) and xk (K × nk)

is stored as its blocks, with all scenario blocks stacked on a leading K
axis. Sharding that axis over a device mesh distributes the per-scenario
work; the only cross-device communication is the reduction of the first
stage's Schur complement (an n0×n0 psum) — inserted automatically by XLA's
GSPMD partitioner from the ``jnp.sum`` over the scenario axis in the
Schur KKT backend (:mod:`tulip_tpu.kkt.schur`).

Variable order: x = [x0; x1; …; xK] flattened; row order:
[first-stage; scenario 1; …; scenario K].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ipm.data import register_operator


class BlockAngularLPData(NamedTuple):
    """Standard-form LP with block-angular constraint structure.

    Same field contract as :class:`tulip_tpu.ipm.data.LPData` (b, c, c0,
    l, u, lflag, uflag as flat vectors over all rows/columns) but the
    constraint matrix is held as blocks A0 (m0, n0), T (K, mk, n0),
    W (K, mk, nk).
    """

    A0: jnp.ndarray      # (m0, n0)
    T: jnp.ndarray       # (K, mk, n0)
    W: jnp.ndarray       # (K, mk, nk)
    b: jnp.ndarray       # (m0 + K*mk,)
    c: jnp.ndarray       # (n0 + K*nk,)
    c0: jnp.ndarray      # scalar
    l: jnp.ndarray
    u: jnp.ndarray
    lflag: jnp.ndarray
    uflag: jnp.ndarray

    @property
    def m0(self) -> int:
        return self.A0.shape[0]

    @property
    def n0(self) -> int:
        return self.A0.shape[1]

    @property
    def K(self) -> int:
        return self.T.shape[0]

    @property
    def mk(self) -> int:
        return self.T.shape[1]

    @property
    def nk(self) -> int:
        return self.W.shape[2]

    @property
    def nrow(self) -> int:
        return self.m0 + self.K * self.mk

    @property
    def ncol(self) -> int:
        return self.n0 + self.K * self.nk

    # -- flat <-> blocked views -----------------------------------------
    def split_cols(self, x: jnp.ndarray):
        """x -> (x0 (n0,), xs (K, nk))."""
        return x[: self.n0], x[self.n0:].reshape(self.K, self.nk)

    def split_rows(self, y: jnp.ndarray):
        """y -> (y0 (m0,), ys (K, mk))."""
        return y[: self.m0], y[self.m0:].reshape(self.K, self.mk)


def _ba_matvec(dat: BlockAngularLPData, x: jnp.ndarray) -> jnp.ndarray:
    x0, xs = dat.split_cols(x)
    top = dat.A0 @ x0
    # Scenario rows: Tk x0 + Wk xk, batched over K (sharded axis).
    scen = jnp.einsum("kij,j->ki", dat.T, x0) + jnp.einsum(
        "kij,kj->ki", dat.W, xs)
    return jnp.concatenate([top, scen.reshape(-1)])


def _ba_rmatvec(dat: BlockAngularLPData, y: jnp.ndarray) -> jnp.ndarray:
    y0, ys = dat.split_rows(y)
    # x0 rows: A0'y0 + Σk Tk'yk  (the Σk is the cross-device reduction).
    top = dat.A0.T @ y0 + jnp.einsum("kij,ki->j", dat.T, ys)
    scen = jnp.einsum("kij,ki->kj", dat.W, ys)
    return jnp.concatenate([top, scen.reshape(-1)])


register_operator(BlockAngularLPData, _ba_matvec, _ba_rmatvec)


def make_block_angular(A0, b0, c0x, T, W, h, cks, l, u, c0=0.0,
                       dtype=jnp.float64) -> BlockAngularLPData:
    """Assemble a BlockAngularLPData from block arrays.

    ``T``/``W``/``h``/``cks`` are (K, ...) stacked scenario arrays or lists;
    ``l``/``u`` are flat bounds over [x0; x1..xK] (may contain ±inf).
    """
    A0 = jnp.asarray(A0, dtype=dtype)
    T = jnp.asarray(np.asarray(T), dtype=dtype)
    W = jnp.asarray(np.asarray(W), dtype=dtype)
    h = np.asarray(h, dtype=np.float64)
    b = np.concatenate([np.asarray(b0, dtype=np.float64), h.reshape(-1)])
    c = np.concatenate([np.asarray(c0x, dtype=np.float64),
                        np.asarray(cks, dtype=np.float64).reshape(-1)])
    l = np.asarray(l, dtype=np.float64)
    u = np.asarray(u, dtype=np.float64)
    lflag = np.isfinite(l)
    uflag = np.isfinite(u)
    return BlockAngularLPData(
        A0=A0, T=T, W=W,
        b=jnp.asarray(b, dtype=dtype),
        c=jnp.asarray(c, dtype=dtype),
        c0=jnp.asarray(c0, dtype=dtype),
        l=jnp.asarray(np.where(lflag, l, 0.0), dtype=dtype),
        u=jnp.asarray(np.where(uflag, u, 0.0), dtype=dtype),
        lflag=jnp.asarray(lflag, dtype=dtype),
        uflag=jnp.asarray(uflag, dtype=dtype),
    )


def pad_scenarios(dat: BlockAngularLPData, K_pad: int) -> BlockAngularLPData:
    """Zero-pad the scenario axis to ``K_pad`` (device-count
    divisibility for sharding). Padded scenarios have T = W = 0, h = 0,
    c_k = 0 and their variables pinned to 0 (l = u = 0, both flags on);
    dual regularization keeps the padded blocks' factors nonsingular, so
    the padded LP solves to the same optimum."""
    K, mk, nk, n0 = dat.K, dat.mk, dat.nk, dat.n0
    dK = K_pad - K
    if dK < 0:
        raise ValueError("K_pad smaller than K")
    if dK == 0:
        return dat
    dt = dat.c.dtype
    zeros_n = jnp.zeros(dK * nk, dt)
    ones_n = jnp.ones(dK * nk, dt)
    return BlockAngularLPData(
        A0=dat.A0,
        T=jnp.concatenate([dat.T, jnp.zeros((dK, mk, n0), dt)]),
        W=jnp.concatenate([dat.W, jnp.zeros((dK, mk, nk), dt)]),
        b=jnp.concatenate([dat.b, jnp.zeros(dK * mk, dt)]),
        c=jnp.concatenate([dat.c, zeros_n]),
        c0=dat.c0,
        l=jnp.concatenate([dat.l, zeros_n]),
        u=jnp.concatenate([dat.u, zeros_n]),
        lflag=jnp.concatenate([dat.lflag, ones_n]),
        uflag=jnp.concatenate([dat.uflag, ones_n]),
    )


def block_angular_to_dense(dat: BlockAngularLPData):
    """Assemble the equivalent dense LPData (for testing / small problems)."""
    from ..ipm.data import LPData

    m0, n0, K, mk, nk = dat.m0, dat.n0, dat.K, dat.mk, dat.nk
    A = jnp.zeros((dat.nrow, dat.ncol), dtype=dat.c.dtype)
    A = A.at[:m0, :n0].set(dat.A0)
    for k in range(K):
        r0 = m0 + k * mk
        c0_ = n0 + k * nk
        A = A.at[r0:r0 + mk, :n0].set(dat.T[k])
        A = A.at[r0:r0 + mk, c0_:c0_ + nk].set(dat.W[k])
    return LPData(A=A, b=dat.b, c=dat.c, c0=dat.c0, l=dat.l, u=dat.u,
                  lflag=dat.lflag, uflag=dat.uflag)


def shard_scenarios(dat: BlockAngularLPData, mesh, axis: str = "scen",
                    ) -> BlockAngularLPData:
    """Place scenario-stacked leaves with their K axis sharded over ``mesh``
    and replicate first-stage data. Flat vectors (b, c, l, u, flags) stay
    replicated — their scenario segments are gathered lazily by XLA where
    needed (cheap: vectors, not matrices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put(name, x):
        if name in ("T", "W"):
            return jax.device_put(x, NamedSharding(
                mesh, P(axis, *([None] * (x.ndim - 1)))))
        return jax.device_put(x, repl)

    return BlockAngularLPData(
        **{f: put(f, getattr(dat, f)) for f in dat._fields})
