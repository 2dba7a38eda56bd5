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


# ---------------------------------------------------------------------------
# True beyond-f64 factorization (the reference's BigFloat-factorization
# role, src/KKT/LDLFactorizations/ldlfact.jl:102-113): dd-residual
# refinement above restores forward error ~u only while the f64
# factorization itself exists (cond(K) < 1/eps_f64 ≈ 9e15); past that
# boundary the f64 Cholesky degenerates and refinement iterates on a
# useless factor. The backend below ASSEMBLES AND FACTORIZES K in
# double-word arithmetic (eps_dd ≈ 2.5e-32), so K1 matrices with
# cond up to ~1e30 factor cleanly. O(m²n + m³) dd ops — slow by design;
# this is the correctness path, selected explicitly (KKT_Backend=
# "extended-dd") or for tests of the f64 factorization boundary.
# ---------------------------------------------------------------------------

import typing  # noqa: E402

import jax  # noqa: E402


class DDK1State(typing.NamedTuple):
    """Pytree state: A + diagonals + the dd Cholesky factor of K1."""

    A: jnp.ndarray
    theta_reg: jnp.ndarray
    regD: jnp.ndarray
    Lhi: jnp.ndarray
    Llo: jnp.ndarray


def dd_cholesky(Kh, Kl):
    """Left-looking dd Cholesky of a dd SPD matrix, column fori_loop with
    vectorized masked updates (O(m) sequential steps of O(m²) dd work)."""
    m = Kh.shape[0]
    idx = jnp.arange(m)

    def body(j, carry):
        Lh, Ll = carry
        kmask = (idx < j).astype(Kh.dtype)            # columns k < j
        # s_i = Σ_{k<j} L[i,k]·L[j,k] in dd.
        rowj = (Lh[j] * kmask, Ll[j] * kmask)
        prod = dd.mul((Lh, Ll), (rowj[0][None, :], rowj[1][None, :]))
        s = dd.sum_(prod, axis=1)                     # dd (m,)
        col = dd.sub((Kh[:, j], Kl[:, j]), s)
        diag = (col[0][j], col[1][j])
        ljj = dd.sqrt_(diag)
        inv = dd.recip((jnp.where(ljj[0] > 0, ljj[0], 1.0),
                        jnp.where(ljj[0] > 0, ljj[1], 0.0)))
        below = (idx > j).astype(Kh.dtype)
        colv = dd.mul(col, (inv[0] * below, inv[1] * below))
        newh = colv[0].at[j].set(ljj[0])
        newl = colv[1].at[j].set(ljj[1])
        return Lh.at[:, j].set(newh), Ll.at[:, j].set(newl)

    Lh, Ll = jax.lax.fori_loop(
        0, m, body, (jnp.zeros_like(Kh), jnp.zeros_like(Kl)))
    return Lh, Ll


def dd_tri_solve(Lh, Ll, bh, bl, trans=False):
    """Solve L y = b (or Lᵀ y = b) with L, b in dd; row-wise fori_loop
    with masked dd dot products."""
    m = Lh.shape[0]
    idx = jnp.arange(m)

    def fwd(j, y):
        yh, yl = y
        mask = (idx < j).astype(Lh.dtype)
        row = (Lh[j] * mask, Ll[j] * mask)
        acc = dd.sum_(dd.mul(row, (yh, yl)), axis=0)
        r = dd.sub((bh[j], bl[j]), acc)
        v = dd.div(r, (Lh[j, j], Ll[j, j]))
        return yh.at[j].set(v[0]), yl.at[j].set(v[1])

    def bwd(t, y):
        j = m - 1 - t
        yh, yl = y
        mask = (idx > j).astype(Lh.dtype)
        col = (Lh[:, j] * mask, Ll[:, j] * mask)      # Lᵀ row j
        acc = dd.sum_(dd.mul(col, (yh, yl)), axis=0)
        r = dd.sub((bh[j], bl[j]), acc)
        v = dd.div(r, (Lh[j, j], Ll[j, j]))
        return yh.at[j].set(v[0]), yl.at[j].set(v[1])

    y0 = (jnp.zeros_like(bh), jnp.zeros_like(bl))
    return jax.lax.fori_loop(0, m, bwd if trans else fwd, y0)


def _dd_matvec_ddvec(A, xh, xl):
    """A @ x with f64 A and dd x → dd, via broadcasted mul_f + tree sum."""
    p = dd.mul_f((xh[None, :] * jnp.ones_like(A),
                  xl[None, :] * jnp.ones_like(A)), A)
    return dd.sum_(p, axis=1)


@dataclasses.dataclass(frozen=True)
class ExtendedDDK1Backend(ExtendedK1Backend):
    """Dense K1 with double-double ASSEMBLY and FACTORIZATION."""

    name = "extended-dd"
    systems = ("K1",)
    refinement_steps: int = 1        # dd-residual sweeps on the dd factor

    def arithmetic(self, state) -> str:
        return "double-double (factorization + refinement)"

    def arithmetic_label(self, dtype) -> str:
        return "double-double factorization"

    def setup(self, A):
        m, n = A.shape
        dt = A.dtype
        z = jnp.zeros((m, m), dt)
        return DDK1State(A=A, theta_reg=jnp.ones(n, dt),
                         regD=jnp.ones(m, dt), Lhi=z, Llo=z)

    def update(self, state, theta_inv, regP, regD):
        A = state.A
        m, n = A.shape
        theta_reg = theta_inv + regP
        dinv = dd.recip(dd.from_f(theta_reg))         # dd (n,)

        # K[:, j] = A (d ∘ A[j, :]) + regD e_j, assembled column-by-column
        # in dd (bounded memory: one (m, n) dd intermediate per column).
        def acol(j, K):
            Kh, Kl = K
            zj = dd.mul(dinv, dd.from_f(A[j, :]))     # d ∘ A[j,:]
            col = _dd_matvec_ddvec(A, zj[0], zj[1])
            # Compensated diagonal add: a plain f64 add into the hi word
            # would drop its rounding error and inject eps_f64-level (not
            # eps_dd) error into diag(K), undercutting the beyond-f64
            # factorization boundary this backend exists for.
            dh, dl = dd.add_f((col[0][j], col[1][j]), regD[j])
            return (Kh.at[:, j].set(col[0].at[j].set(dh)),
                    Kl.at[:, j].set(col[1].at[j].set(dl)))

        Kh, Kl = jax.lax.fori_loop(
            0, m, acol, (jnp.zeros((m, m), A.dtype),
                         jnp.zeros((m, m), A.dtype)))
        Lh, Ll = dd_cholesky(Kh, Kl)
        ok = jnp.all(jnp.isfinite(Lh)) & jnp.all(jnp.isfinite(Ll))
        eye = jnp.eye(m, dtype=A.dtype)
        Lh = jnp.where(ok, Lh, eye)
        Ll = jnp.where(ok, Ll, jnp.zeros_like(Ll))
        return DDK1State(A=A, theta_reg=theta_reg, regD=regD,
                         Lhi=Lh, Llo=Ll), ok

    def _base_solve(self, state, xi_p, xi_d):
        A = state.A
        dinv = dd.recip(dd.from_f(state.theta_reg))
        # rhs = ξp + A (d ∘ ξd) in dd.
        dz = dd.mul(dinv, dd.from_f(xi_d))
        rhs = dd.add(dd.from_f(xi_p), _dd_matvec_ddvec(A, dz[0], dz[1]))
        u = dd_tri_solve(state.Lhi, state.Llo, rhs[0], rhs[1])
        y = dd_tri_solve(state.Lhi, state.Llo, u[0], u[1], trans=True)
        # dx = d ∘ (Aᵀ y − ξd) in dd.
        aty = _dd_matvec_ddvec(A.T, y[0], y[1])
        dx = dd.mul(dinv, dd.sub(aty, dd.from_f(xi_d)))
        return dd.to_f(dx), dd.to_f(y)

    def solve(self, state, xi_p, xi_d):
        if state.A.dtype != jnp.float64:
            raise TypeError(
                "extended-dd backend requires float64 data; "
                f"got {state.A.dtype}")
        dx, dy = self._base_solve(state, xi_p, xi_d)
        for _ in range(self.refinement_steps):
            rp, rd = self._dd_residuals(state, xi_p, xi_d, dx, dy)
            ddx, ddy = self._base_solve(state, rp, rd)
            dx = dx + ddx
            dy = dy + ddy
        return dx, dy
