"""Matrix-free Krylov KKT backends.

Counterpart of the reference's TlpKrylov module
(reference: src/KKT/Krylov/{krylov,defs,spd,sid}.jl): instead of a
factorization, ``update`` only refreshes the diagonals, and ``solve`` runs an
iterative method against an implicit operator. On TPU the operator
application is two GEMVs (MXU work), and everything sits inside
``lax.while_loop`` — no host round-trips per Krylov iteration.

- ``CgK1Backend``: conjugate gradients on the SPD normal-equations operator
  ``w ↦ A D Aᵀ w + Rd w`` with Jacobi preconditioning
  (reference operator shape: src/KKT/Krylov/spd.jl:55-63).
- ``MinresK2Backend``: MINRES on the full symmetric indefinite augmented
  operator over (dx, dy) (reference: src/KKT/Krylov/sid.jl:50-64).
- ``TricgK2Backend``: the reference's SQD family (TriCG,
  reference: src/KKT/Krylov/sqd.jl:87-92) — exploits the symmetric
  quasi-definite 2x2 block form with the natural diagonal preconditioners
  M = Rd, N = Θ⁻¹+Rp via the Saunders-Simon-Yip tridiagonalization
  (Montoison & Orban, SIAM J. Sci. Comput. 2021). Experimental for full
  IPM runs: once Θ spans ~16 orders of magnitude near convergence the
  short recurrences lose orthogonality and the unweighted dual residual
  degrades (the N⁻¹-weighted Galerkin residual it controls stays small) —
  prefer ``sqd-minres`` end-to-end, matching the reference's own framing
  of its Krylov backends as research options.
- ``SqdMinresK2Backend``: minimum-residual counterpart (the TriMR role):
  MINRES on the SQD system symmetrically scaled by diag(M,N)^(-1/2), i.e.
  block-Jacobi-preconditioned MINRES.

Tolerances default to sqrt(eps) like the reference (spd.jl:66-67).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import KKTBackend


class KrylovState(NamedTuple):
    A: jnp.ndarray          # (m, n)
    d: jnp.ndarray          # (n,)  D = (Θ⁻¹ + Rp)⁻¹
    theta_reg: jnp.ndarray  # (n,)  Θ⁻¹ + Rp
    regD: jnp.ndarray       # (m,)


def _sqrt_eps(dt) -> float:
    return float(np.sqrt(np.finfo(np.dtype(dt.name)).eps))


def minres(matvec: Callable, b: jnp.ndarray, rtol, maxiter: int,
           ) -> jnp.ndarray:
    """MINRES (Paige & Saunders 1975) for symmetric (possibly indefinite)
    systems, as a single ``lax.while_loop``."""
    dt = b.dtype
    zero = jnp.zeros((), dt)
    one = jnp.ones((), dt)

    beta1 = jnp.linalg.norm(b)
    beta1_safe = jnp.where(beta1 == 0, one, beta1)

    # carry: (x, v_prev, v, beta, eta, gamma0, gamma1, sigma0, sigma1,
    #         w_mm, w_m, k, rnorm)
    x0 = jnp.zeros_like(b)
    v0 = b / beta1_safe
    carry0 = (x0, jnp.zeros_like(b), v0, beta1, beta1, one, one, zero, zero,
              jnp.zeros_like(b), jnp.zeros_like(b), jnp.zeros((), jnp.int32),
              beta1)

    tol = rtol * beta1_safe

    def cond(c):
        *_, k, rnorm = c
        return (rnorm > tol) & (k < maxiter)

    def body(c):
        (x, v_prev, v, beta, eta, g0, g1, s0, s1, w_mm, w_m, k, _) = c
        Av = matvec(v)
        alpha = jnp.dot(v, Av)
        r = Av - alpha * v - beta * v_prev
        beta_next = jnp.linalg.norm(r)
        beta_next_safe = jnp.where(beta_next == 0, one, beta_next)
        v_next = r / beta_next_safe

        delta = g1 * alpha - g0 * s1 * beta
        rho1 = jnp.sqrt(delta * delta + beta_next * beta_next)
        rho1_safe = jnp.where(rho1 == 0, one, rho1)
        rho2 = s1 * alpha + g0 * g1 * beta
        rho3 = s0 * beta
        g_next = delta / rho1_safe
        s_next = beta_next / rho1_safe

        w = (v - rho3 * w_mm - rho2 * w_m) / rho1_safe
        x = x + g_next * eta * w
        eta_next = -s_next * eta
        rnorm = jnp.abs(eta_next)
        return (x, v, v_next, beta_next, eta_next, g1, g_next, s1, s_next,
                w_m, w, k + 1, rnorm)

    out = jax.lax.while_loop(cond, body, carry0)
    return out[0]


def pcg(matvec: Callable, b: jnp.ndarray, precond: Callable, rtol,
        maxiter: int) -> jnp.ndarray:
    """Preconditioned conjugate gradients as a single ``lax.while_loop``."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    gamma0 = jnp.dot(r0, z0)
    bnorm = jnp.linalg.norm(b)
    tol2 = (rtol * jnp.where(bnorm == 0, 1.0, bnorm)) ** 2

    def cond(c):
        x, r, z, p, gamma, k = c
        return (jnp.dot(r, r) > tol2) & (k < maxiter)

    def body(c):
        x, r, z, p, gamma, k = c
        Ap = matvec(p)
        denom = jnp.dot(p, Ap)
        alpha = gamma / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        gamma_new = jnp.dot(r, z)
        beta = gamma_new / jnp.where(gamma == 0, 1.0, gamma)
        p = z + beta * p
        return x, r, z, p, gamma_new, k + 1

    out = jax.lax.while_loop(cond, body,
                             (x0, r0, z0, z0, gamma0,
                              jnp.zeros((), jnp.int32)))
    return out[0]


def cr(matvec: Callable, b: jnp.ndarray, precond: Callable, rtol,
       maxiter: int) -> jnp.ndarray:
    """Preconditioned conjugate residuals (SPD; minimizes ||r|| instead of
    the A-norm error — the reference's SPD family also exposes CR,
    reference: src/KKT/Krylov/defs.jl:1-17)."""
    x0 = jnp.zeros_like(b)
    r0 = precond(b)
    p0 = r0
    Ar0 = matvec(r0)
    Ap0 = Ar0
    gamma0 = jnp.dot(r0, Ar0)
    bnorm = jnp.linalg.norm(b)
    tol2 = (rtol * jnp.where(bnorm == 0, 1.0, bnorm)) ** 2

    def cond(c):
        x, r, p, Ar, Ap, gamma, k = c
        return (jnp.dot(r, r) > tol2) & (k < maxiter)

    def body(c):
        x, r, p, Ar, Ap, gamma, k = c
        MAp = precond(Ap)
        denom = jnp.dot(Ap, MAp)
        alpha = gamma / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * MAp
        Ar = matvec(r)
        gamma_new = jnp.dot(r, Ar)
        beta = gamma_new / jnp.where(gamma == 0, 1.0, gamma)
        p = r + beta * p
        Ap = Ar + beta * Ap
        return x, r, p, Ar, Ap, gamma_new, k + 1

    out = jax.lax.while_loop(cond, body,
                             (x0, r0, p0, Ar0, Ap0, gamma0,
                              jnp.zeros((), jnp.int32)))
    return out[0]


def symmlq(matvec: Callable, b: jnp.ndarray, rtol, maxiter: int,
           ) -> jnp.ndarray:
    """SYMMLQ (Paige & Saunders 1975) for symmetric (possibly indefinite)
    systems, as one ``lax.while_loop``.

    Derivation used here: with Lanczos ``A V_k = V_{k+1} T̄_k``, the
    Galerkin condition for x = V_{k+1} y reads ``T̄_kᵀ y = β₁ e₁``
    (underdetermined); SYMMLQ takes the minimum-norm y via an LQ
    factorization of T̄ᵀ built from symmetric reflection rotations
    G_i = [[c, s], [s, -c]] on columns (i, i+1):

        ε_k = s_{k-2} β_k,   δ_k = -c_{k-1} c_{k-2} β_k + s_{k-1} α_k,
        γ̄_k = -s_{k-1} c_{k-2} β_k - c_{k-1} α_k,
        γ_k = hypot(γ̄_k, β_{k+1}),  c_k = γ̄_k/γ_k,  s_k = β_{k+1}/γ_k

    forward solve L z = β₁ e₁ and direction columns W = V Qᵀ via
    ``w_k = c_k w̄_k + s_k v_{k+1}``, ``w̄_{k+1} = s_k w̄_k - c_k v_{k+1}``.
    Stopping uses the true residual (one extra matvec per iteration —
    SYMMLQ here is a conformance/fallback method; MINRES is the
    production SID solver)."""
    dt = b.dtype
    one = jnp.ones((), dt)

    def safe(x):
        return jnp.where(x == 0, one, x)

    beta1 = jnp.linalg.norm(b)
    v1 = b / safe(beta1)
    # First Lanczos step.
    u = matvec(v1)
    alpha1 = jnp.dot(v1, u)
    u = u - alpha1 * v1
    beta2 = jnp.linalg.norm(u)
    v2 = u / safe(beta2)
    tol = rtol * safe(beta1)

    # carry: x, v_k, v_{k+1}, α_k, β_k, β_{k+1}, c_{k-2}, s_{k-2},
    #        c_{k-1}, s_{k-1}, z_{k-2}, z_{k-1}, h (forward-solve RHS:
    #        β₁ at k=1, then 0), w̄_k, k, rnorm.  c₀ = -1, s₀ = 0 make the
    #        k=1,2 edge rows come out of the general recurrences.
    carry0 = (jnp.zeros_like(b), v1, v2, alpha1, jnp.zeros((), dt), beta2,
              -one, jnp.zeros((), dt), -one, jnp.zeros((), dt),
              jnp.zeros((), dt), jnp.zeros((), dt), beta1, v1,
              jnp.zeros((), jnp.int32), beta1)

    def cond(c):
        *_, k, rnorm = c
        return (rnorm > tol) & (k < maxiter)

    def body(c):
        (x, vk, vk1, alpha, beta_k, beta_n, c2, s2, c1, s1, z2, z1, h,
         wbar, k, _) = c
        eps_k = s2 * beta_k
        delta_k = -c1 * c2 * beta_k + s1 * alpha
        gbar_k = -s1 * c2 * beta_k - c1 * alpha
        gamma_k = jnp.sqrt(gbar_k ** 2 + beta_n ** 2)
        ck = gbar_k / safe(gamma_k)
        sk = beta_n / safe(gamma_k)
        # Forward solve: z_k = (h - ε_k z_{k-2} - δ_k z_{k-1}) / γ_k with
        # h = β₁ for k=1 and 0 after.
        zk = (h - eps_k * z2 - delta_k * z1) / safe(gamma_k)
        # Direction and iterate.
        wk = ck * wbar + sk * vk1
        wbar_next = sk * wbar - ck * vk1
        x = x + zk * wk
        # Next Lanczos step (α_{k+1}, β_{k+2}, v_{k+2}).
        u = matvec(vk1) - beta_n * vk
        alpha_next = jnp.dot(vk1, u)
        u = u - alpha_next * vk1
        beta_nn = jnp.linalg.norm(u)
        v_next = u / safe(beta_nn)
        # True residual for stopping (extra matvec).
        rnorm = jnp.linalg.norm(b - matvec(x))
        return (x, vk1, v_next, alpha_next, beta_n, beta_nn, c1, s1,
                ck, sk, z1, zk, jnp.zeros((), dt), wbar_next, k + 1, rnorm)

    out = jax.lax.while_loop(cond, body, carry0)
    return out[0]


def tricg(A, Mdiag, Ndiag, b, c, rtol, maxiter):
    """TriCG: Galerkin method for the symmetric quasi-definite system

        [ M   A ] [x]   [b]
        [ Aᵀ  -N ] [y] = [c]

    with diagonal SPD M (m) and N (n), via the preconditioned
    Saunders-Simon-Yip process. Bases V (M-orthonormal) and U
    (N-orthonormal) satisfy ``A U_k = M V_k T_k + β_{k+1} M v_{k+1} e_kᵀ``
    and ``Aᵀ V_k = N U_k T_kᵀ + γ_{k+1} N u_{k+1} e_kᵀ``; the Galerkin
    conditions reduce to the 2k×2k SQD block-tridiagonal system
    ``[I T; Tᵀ -I]`` solved incrementally by block-LDLᵀ with 2×2 pivots
    (strongly factorizable — Vanderbei). O(m+n) storage per iteration.
    """
    dt = b.dtype
    one = jnp.ones((), dt)
    Minv = 1.0 / Mdiag
    Ninv = 1.0 / Ndiag

    def safe(s):
        return jnp.where(s == 0, one, s)

    beta1 = jnp.sqrt(jnp.dot(b, Minv * b))
    gamma1 = jnp.sqrt(jnp.dot(c, Ninv * c))
    v1 = (Minv * b) / safe(beta1)
    u1 = (Ninv * c) / safe(gamma1)
    tol = rtol * jnp.sqrt(beta1 ** 2 + gamma1 ** 2)
    h1 = jnp.stack([beta1, gamma1])

    m, n = A.shape
    z2 = jnp.zeros((2, 2), dt)
    carry0 = (
        jnp.zeros(m, dt), jnp.zeros(n, dt),        # x, y
        jnp.zeros(m, dt), v1,                       # v_prev, v
        jnp.zeros(n, dt), u1,                       # u_prev, u
        beta1, gamma1,                              # β_k, γ_k
        z2, jnp.zeros(2, dt),                       # Δ_{k-1}⁻¹, ζ_{k-1}
        jnp.zeros(m, dt), jnp.zeros(n, dt),         # G col1 (v-part, u-part)
        jnp.zeros(m, dt), jnp.zeros(n, dt),         # G col2
        jnp.zeros((), jnp.int32),
        jnp.sqrt(beta1 ** 2 + gamma1 ** 2),         # rnorm estimate
    )

    def cond(cr_):
        *_, k, rnorm = cr_
        return (rnorm > tol) & (k < maxiter)

    def body(cr_):
        (x, y, v_prev, v, u_prev, u, beta, gamma, Dinv_prev, zeta_prev,
         g1v, g1u, g2v, g2u, k, _) = cr_
        Au = A @ u
        Atv = A.T @ v
        alpha = jnp.dot(v, Au)
        q = Minv * Au - gamma * v_prev - alpha * v
        p = Ninv * Atv - beta * u_prev - alpha * u
        beta_n = jnp.sqrt(jnp.dot(q, Mdiag * q))
        gamma_n = jnp.sqrt(jnp.dot(p, Ndiag * p))
        # Breakdown deflation: when one Krylov space is exhausted the new
        # norm is pure rounding noise; normalizing it would inject a junk
        # basis vector and break the three-term recurrences. Zero the
        # vector instead (the process then keeps expanding the other
        # space, which is the exact-arithmetic behavior).
        eps_b = jnp.asarray(np.finfo(np.dtype(dt.name)).eps ** 0.75, dt)
        scale_q = jnp.sqrt(jnp.dot(Au, Minv * Au)) + gamma + jnp.abs(alpha)
        scale_p = jnp.sqrt(jnp.dot(Atv, Ninv * Atv)) + beta + jnp.abs(alpha)
        dead_v = beta_n <= eps_b * scale_q
        dead_u = gamma_n <= eps_b * scale_p
        beta_n = jnp.where(dead_v, 0.0, beta_n)
        gamma_n = jnp.where(dead_u, 0.0, gamma_n)
        v_next = jnp.where(dead_v, 0.0, q / safe(beta_n))
        u_next = jnp.where(dead_u, 0.0, p / safe(gamma_n))

        # Block-LDLᵀ step on [I T; Tᵀ -I] in interleaved (x̄_i, ȳ_i) order:
        # diag blocks Ω_i=[1 α_i; α_i -1], coupling Ψ_{i-1}=[0 γ_i; β_i 0].
        psi = jnp.array([[0.0, 0.0], [0.0, 0.0]], dt)
        psi = psi.at[0, 1].set(gamma).at[1, 0].set(beta)
        lam = psi.T @ Dinv_prev                 # Λ_k = Ψ_{k-1}ᵀ Δ_{k-1}⁻¹
        omega = jnp.array([[0.0, 0.0], [0.0, 0.0]], dt)
        omega = omega.at[0, 0].set(1.0).at[0, 1].set(alpha) \
                     .at[1, 0].set(alpha).at[1, 1].set(-1.0)
        delta = omega - lam @ psi
        det = delta[0, 0] * delta[1, 1] - delta[0, 1] * delta[1, 0]
        dinv = jnp.array([[0.0, 0.0], [0.0, 0.0]], dt)
        dinv = dinv.at[0, 0].set(delta[1, 1]).at[0, 1].set(-delta[0, 1]) \
                   .at[1, 0].set(-delta[1, 0]).at[1, 1].set(delta[0, 0])
        dinv = dinv / safe(det)
        h = jnp.where(k == 0, h1, jnp.zeros(2, dt))
        zeta = h - lam @ zeta_prev
        # Direction blocks G_k = P_k - G_{k-1} Λ_kᵀ with P_k = [v 0; 0 u].
        g1v_n = v - (g1v * lam[0, 0] + g2v * lam[0, 1])
        g1u_n = -(g1u * lam[0, 0] + g2u * lam[0, 1])
        g2v_n = -(g1v * lam[1, 0] + g2v * lam[1, 1])
        g2u_n = u - (g1u * lam[1, 0] + g2u * lam[1, 1])
        t = dinv @ zeta                          # last block of w̄
        x = x + t[0] * g1v_n + t[1] * g2v_n
        y = y + t[0] * g1u_n + t[1] * g2u_n
        # Residual lies in span{Mv_{k+1}, Nu_{k+1}}:
        # ‖r‖ over diag(M⁻¹,N⁻¹) = hypot(β_{k+1}·ȳ_k, γ_{k+1}·x̄_k).
        rnorm = jnp.sqrt((beta_n * t[1]) ** 2 + (gamma_n * t[0]) ** 2)
        return (x, y, v, v_next, u, u_next, beta_n, gamma_n, dinv, zeta,
                g1v_n, g1u_n, g2v_n, g2u_n, k + 1, rnorm)

    out = jax.lax.while_loop(cond, body, carry0)
    return out[0], out[1]


@dataclasses.dataclass(frozen=True)
class CgK1Backend(KKTBackend):
    name = "cg"
    systems = ("K1",)
    rtol: float = 0.0        # 0 -> sqrt(eps(dtype))
    maxiter_factor: int = 10  # maxiter = factor * m

    def arithmetic(self, state) -> str:
        return str(state.A.dtype)

    def linear_system(self) -> str:
        return "Normal equations (K1), CG"

    def setup(self, A: jnp.ndarray) -> KrylovState:
        m, n = A.shape
        dt = A.dtype
        return KrylovState(A=A, d=jnp.ones(n, dt), theta_reg=jnp.ones(n, dt),
                           regD=jnp.ones(m, dt))

    def update(self, state: KrylovState, theta_inv, regP, regD):
        theta_reg = theta_inv + regP
        new = KrylovState(A=state.A, d=1.0 / theta_reg, theta_reg=theta_reg,
                          regD=regD)
        ok = jnp.all(theta_reg > 0) & jnp.all(regD > 0)
        return new, ok

    def _base_solve(self, state: KrylovState, xi_p, xi_d):
        A, d, regD = state.A, state.d, state.regD
        rtol = self.rtol or _sqrt_eps(A.dtype)
        maxiter = self.maxiter_factor * A.shape[0]

        def K_mv(w):
            return A @ (d * (A.T @ w)) + regD * w

        # Jacobi preconditioner: diag(A D Aᵀ) + Rd.
        Kdiag = (A * A) @ d + regD
        rhs = xi_p + A @ (d * xi_d)
        dy = pcg(K_mv, rhs, lambda r: r / Kdiag, rtol, maxiter)
        dx = d * (A.T @ dy - xi_d)
        return dx, dy

    def solve(self, state, xi_p, xi_d):
        dx, dy = self._base_solve(state, xi_p, xi_d)
        return self._refine(state, xi_p, xi_d, dx, dy, self._base_solve)


@dataclasses.dataclass(frozen=True)
class CrK1Backend(CgK1Backend):
    """Conjugate residuals on the K1 normal equations."""

    name = "cr"

    def linear_system(self) -> str:
        return "Normal equations (K1), CR"

    def _base_solve(self, state: KrylovState, xi_p, xi_d):
        A, d, regD = state.A, state.d, state.regD
        rtol = self.rtol or _sqrt_eps(A.dtype)
        maxiter = self.maxiter_factor * A.shape[0]

        def K_mv(w):
            return A @ (d * (A.T @ w)) + regD * w

        Kdiag = (A * A) @ d + regD
        rhs = xi_p + A @ (d * xi_d)
        dy = cr(K_mv, rhs, lambda r: r / Kdiag, rtol, maxiter)
        dx = d * (A.T @ dy - xi_d)
        return dx, dy


@dataclasses.dataclass(frozen=True)
class MinresK2Backend(KKTBackend):
    name = "minres"
    systems = ("K2",)
    rtol: float = 0.0
    maxiter_factor: int = 10

    def arithmetic(self, state) -> str:
        return str(state.A.dtype)

    def linear_system(self) -> str:
        return "Augmented system (K2), MINRES"

    def setup(self, A: jnp.ndarray) -> KrylovState:
        m, n = A.shape
        dt = A.dtype
        return KrylovState(A=A, d=jnp.ones(n, dt), theta_reg=jnp.ones(n, dt),
                           regD=jnp.ones(m, dt))

    update = CgK1Backend.update

    def _base_solve(self, state: KrylovState, xi_p, xi_d):
        A, theta_reg, regD = state.A, state.theta_reg, state.regD
        m, n = A.shape
        rtol = self.rtol or _sqrt_eps(A.dtype)
        maxiter = self.maxiter_factor * (m + n)

        def K2_mv(w):
            wx, wy = w[:n], w[n:]
            top = -theta_reg * wx + A.T @ wy
            bot = A @ wx + regD * wy
            return jnp.concatenate([top, bot])

        rhs = jnp.concatenate([xi_d, xi_p])
        sol = minres(K2_mv, rhs, rtol, maxiter)
        return sol[:n], sol[n:]

    def solve(self, state, xi_p, xi_d):
        dx, dy = self._base_solve(state, xi_p, xi_d)
        return self._refine(state, xi_p, xi_d, dx, dy, self._base_solve)


@dataclasses.dataclass(frozen=True)
class TricgK2Backend(KKTBackend):
    """TriCG on the SQD augmented system (the reference's TriCG/TriMR
    family, reference: src/KKT/Krylov/sqd.jl:87-92). The K2 system

        [-(Θ⁻¹+Rp)  Aᵀ] [dx]   [ξd]
        [    A      Rd] [dy] = [ξp]

    reordered as [Rd A; Aᵀ -(Θ⁻¹+Rp)][dy; dx] = [ξp; ξd] is exactly the
    TriCG form with M = Rd, N = Θ⁻¹+Rp — the same natural diagonal
    preconditioners the reference passes to Krylov.jl (sqd.jl:90-91)."""

    name = "tricg"
    systems = ("K2",)
    rtol: float = 0.0
    maxiter_factor: int = 10

    def arithmetic(self, state) -> str:
        return str(state.A.dtype)

    def linear_system(self) -> str:
        return "Augmented system (K2), TriCG"

    setup = MinresK2Backend.setup
    update = CgK1Backend.update

    def _base_solve(self, state: KrylovState, xi_p, xi_d):
        A, theta_reg, regD = state.A, state.theta_reg, state.regD
        rtol = self.rtol or _sqrt_eps(A.dtype)
        maxiter = self.maxiter_factor * sum(A.shape)
        dy, dx = tricg(A, regD, theta_reg, xi_p, xi_d, rtol, maxiter)
        return dx, dy

    def solve(self, state, xi_p, xi_d):
        dx, dy = self._base_solve(state, xi_p, xi_d)
        return self._refine(state, xi_p, xi_d, dx, dy, self._base_solve)


@dataclasses.dataclass(frozen=True)
class SqdMinresK2Backend(MinresK2Backend):
    """Minimum-residual method on the SQD augmented system with the natural
    block-Jacobi preconditioner (the TriMR role of the reference's SQD
    family): symmetrically scale K2 by diag(Θ⁻¹+Rp, Rd)^(-1/2) so the
    scaled operator is [-I Â; Âᵀ I], then run MINRES and unscale."""

    name = "sqd-minres"

    def linear_system(self) -> str:
        return "Augmented system (K2), SQD-scaled MINRES"

    def _base_solve(self, state: KrylovState, xi_p, xi_d):
        A, theta_reg, regD = state.A, state.theta_reg, state.regD
        m, n = A.shape
        rtol = self.rtol or _sqrt_eps(A.dtype)
        maxiter = self.maxiter_factor * (m + n)
        f = jnp.sqrt(theta_reg)          # F = (Θ⁻¹+Rp)^(1/2)
        e = jnp.sqrt(regD)               # E = Rd^(1/2)

        def K2_mv(w):
            wx, wy = w[:n], w[n:]
            top = -wx + (A.T @ (wy / e)) / f
            bot = (A @ (wx / f)) / e + wy
            return jnp.concatenate([top, bot])

        rhs = jnp.concatenate([xi_d / f, xi_p / e])
        sol = minres(K2_mv, rhs, rtol, maxiter)
        return sol[:n] / f, sol[n:] / e


@dataclasses.dataclass(frozen=True)
class SymmlqK2Backend(MinresK2Backend):
    """SYMMLQ on the augmented system (the reference's SID family also
    exposes SYMMLQ, reference: src/KKT/Krylov/defs.jl:9-17). Galerkin
    (minimum-error) counterpart of MINRES; kept as a conformance/fallback
    option — it spends one extra operator application per iteration on
    true-residual stopping."""

    name = "symmlq"

    def linear_system(self) -> str:
        return "Augmented system (K2), SYMMLQ"

    def _base_solve(self, state: KrylovState, xi_p, xi_d):
        A, theta_reg, regD = state.A, state.theta_reg, state.regD
        m, n = A.shape
        rtol = self.rtol or _sqrt_eps(A.dtype)
        maxiter = self.maxiter_factor * (m + n)

        def K2_mv(w):
            wx, wy = w[:n], w[n:]
            top = -theta_reg * wx + A.T @ wy
            bot = A @ wx + regD * wy
            return jnp.concatenate([top, bot])

        rhs = jnp.concatenate([xi_d, xi_p])
        sol = symmlq(K2_mv, rhs, rtol, maxiter)
        return sol[:n], sol[n:]
