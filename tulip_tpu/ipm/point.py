"""Primal-dual iterate and residuals as pytrees.

Mirrors the reference's Point / Residuals semantics
(reference: src/IPM/point.jl:6-48, src/IPM/residuals.jl:6-22) but as
immutable NamedTuples so the whole iterate flows through jit/vmap/scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .data import LPData, matvec, rmatvec


class Point(NamedTuple):
    """Primal-dual point.

    ``xl``/``xu`` are bound slacks (``x - xl = l``, ``x + xu = u``), zero on
    masked bounds; ``zl``/``zu`` the corresponding duals; ``tau``/``kappa``
    the homogeneous embedding variables ((1, 0) fixed for MPC); ``mu`` the
    barrier parameter (reference: src/IPM/point.jl:6-48).
    """

    x: jnp.ndarray    # (n,)
    xl: jnp.ndarray   # (n,)
    xu: jnp.ndarray   # (n,)
    y: jnp.ndarray    # (m,)
    zl: jnp.ndarray   # (n,)
    zu: jnp.ndarray   # (n,)
    tau: jnp.ndarray  # scalar
    kappa: jnp.ndarray  # scalar
    mu: jnp.ndarray   # scalar


def starting_point(dat: LPData, hflag: bool = True) -> Point:
    """Cold start: x = 0, unit bound slacks/duals on flagged bounds,
    tau = kappa = 1 (reference: src/IPM/HSD/HSD.jl:238-249)."""
    dt = dat.c.dtype
    n, m = dat.ncol, dat.nrow
    one = jnp.ones((), dtype=dt)
    pt = Point(
        x=jnp.zeros(n, dtype=dt),
        xl=dat.lflag.astype(dt),
        xu=dat.uflag.astype(dt),
        y=jnp.zeros(m, dtype=dt),
        zl=dat.lflag.astype(dt),
        zu=dat.uflag.astype(dt),
        tau=one,
        kappa=one if hflag else jnp.zeros((), dtype=dt),
        mu=one,
    )
    return update_mu(pt, dat, hflag=hflag)


def num_finite_bounds(dat: LPData) -> jnp.ndarray:
    return jnp.sum(dat.lflag) + jnp.sum(dat.uflag)


def update_mu(pt: Point, dat: LPData, hflag: bool = True) -> Point:
    """mu = (xl'zl + xu'zu + hflag*tau*kappa) / (p + hflag)
    (reference: src/IPM/point.jl:45-48)."""
    p = num_finite_bounds(dat)
    h = 1.0 if hflag else 0.0
    # p + h = 0 (MPC on an all-free-variable LP): the numerator is exactly 0
    # too — there is no complementarity — so mu := 0, not 0/0 = NaN.
    mu = (jnp.dot(pt.xl, pt.zl) + jnp.dot(pt.xu, pt.zu)
          + h * pt.tau * pt.kappa) / jnp.maximum(p + h, 1.0)
    return pt._replace(mu=mu)


class Residuals(NamedTuple):
    """Primal/dual/bound/gap residuals and their inf-norms
    (reference: src/IPM/residuals.jl:6-22)."""

    rp: jnp.ndarray   # (m,)  tau*b - A x
    rl: jnp.ndarray   # (n,)  tau*l - (x - xl), masked
    ru: jnp.ndarray   # (n,)  tau*u - (x + xu), masked
    rd: jnp.ndarray   # (n,)  tau*c - A'y - zl + zu
    rg: jnp.ndarray   # scalar  c'x - b'y - l'zl + u'zu + kappa
    rp_nrm: jnp.ndarray
    rl_nrm: jnp.ndarray
    ru_nrm: jnp.ndarray
    rd_nrm: jnp.ndarray
    rg_nrm: jnp.ndarray


def inf_norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.abs(v)) if v.ndim else jnp.abs(v)


def compute_residuals(dat: LPData, pt: Point) -> Residuals:
    """Residuals at ``pt`` (reference: src/IPM/HSD/HSD.jl:77-128)."""
    rp = pt.tau * dat.b - matvec(dat, pt.x)
    rl = (-pt.x + pt.xl + pt.tau * dat.l) * dat.lflag
    ru = (-pt.x - pt.xu + pt.tau * dat.u) * dat.uflag
    rd = (pt.tau * dat.c - rmatvec(dat, pt.y)
          - pt.zl * dat.lflag + pt.zu * dat.uflag)
    rg = pt.kappa + (jnp.dot(dat.c, pt.x)
                     - (jnp.dot(dat.b, pt.y)
                        + jnp.dot(dat.l * dat.lflag, pt.zl)
                        - jnp.dot(dat.u * dat.uflag, pt.zu)))
    return Residuals(
        rp=rp, rl=rl, ru=ru, rd=rd, rg=rg,
        rp_nrm=inf_norm(rp), rl_nrm=inf_norm(rl), ru_nrm=inf_norm(ru),
        rd_nrm=inf_norm(rd), rg_nrm=jnp.abs(rg),
    )


def primal_objective(dat: LPData, pt: Point) -> jnp.ndarray:
    """(c'x)/tau + c0 (reference: HSD.jl:120)."""
    return jnp.dot(dat.c, pt.x) / pt.tau + dat.c0


def dual_objective(dat: LPData, pt: Point) -> jnp.ndarray:
    """(b'y + l'zl - u'zu)/tau + c0 (reference: HSD.jl:121-125)."""
    return (jnp.dot(dat.b, pt.y)
            + jnp.dot(dat.l * dat.lflag, pt.zl)
            - jnp.dot(dat.u * dat.uflag, pt.zu)) / pt.tau + dat.c0
