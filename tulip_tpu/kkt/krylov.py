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
