"""Warm-started re-solves.

The reference has no warm-start support (noted as future work,
reference: src/Interfaces/MOI/constraints.jl:14-16); every solve is a cold
start. For the TPU framework's batched/sequential re-solve workloads
(perturbed scenarios, rolling horizons) warm starts are a first-class win,
so we provide the standard homogeneous-IPM scheme (Skajaa-Andersen-Ye
style): blend the previous iterate with the cold-start point and re-center
the homogeneous variables,

    pt = λ·prev + (1-λ)·cold,   τ = 1,   κ = μ(pt),

which keeps the point safely interior while retaining most of the previous
solution's information. Falls back gracefully: with λ = 0 this is exactly
the cold start.
"""

from __future__ import annotations

import jax.numpy as jnp

from .data import LPData
from .hsd import HSDState, init_state
from .point import Point, num_finite_bounds, starting_point, update_mu


def blend_point(dat: LPData, prev: Point, lam: float = 0.99) -> Point:
    """λ·prev + (1-λ)·cold with re-centered (τ, κ)."""
    cold = starting_point(dat, hflag=True)
    lam = jnp.asarray(lam, dtype=prev.x.dtype)

    def mix(a, b):
        return lam * a + (1.0 - lam) * b

    pt = Point(
        x=mix(prev.x, cold.x),
        xl=mix(prev.xl, cold.xl),
        xu=mix(prev.xu, cold.xu),
        y=mix(prev.y, cold.y),
        zl=mix(prev.zl, cold.zl),
        zu=mix(prev.zu, cold.zu),
        tau=jnp.ones((), prev.x.dtype),
        kappa=jnp.ones((), prev.x.dtype),
        mu=prev.mu,
    )
    # κ = μ so that the homogeneous product starts on-center.
    p = num_finite_bounds(dat)
    mu = (jnp.dot(pt.xl, pt.zl) + jnp.dot(pt.xu, pt.zu)) / p
    pt = pt._replace(kappa=jnp.maximum(mu, 1e-8))
    return update_mu(pt, dat, hflag=True)


def warm_state(dat: LPData, backend, prev: HSDState,
               lam: float = 0.99) -> HSDState:
    """Initial HSD state for re-solving ``dat`` starting from the final
    state ``prev`` of a related solve (same shapes).

    The previous point is normalized by its τ before blending so the warm
    point lives at the τ=1 scale of the embedding.
    """
    state = init_state(dat, backend)
    tau_inv = 1.0 / prev.pt.tau
    prev_pt = Point(
        x=prev.pt.x * tau_inv, xl=prev.pt.xl * tau_inv,
        xu=prev.pt.xu * tau_inv, y=prev.pt.y * tau_inv,
        zl=prev.pt.zl * tau_inv, zu=prev.pt.zu * tau_inv,
        tau=jnp.ones((), prev.pt.x.dtype),
        kappa=prev.pt.kappa, mu=prev.pt.mu)
    return state._replace(pt=blend_point(dat, prev_pt, lam))
