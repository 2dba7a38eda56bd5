"""IPM unit tests: residual formulas, step lengths, starting point.

Mirrors the reference's IPM unit tests (reference: test/IPM/HSD.jl:8-149,
test/IPM/MPC.jl): residuals checked against hand-computed values on a tiny
LP; max_step_length edge cases; convergence-flag logic by planting an
optimal point.
"""

import jax.numpy as jnp
import numpy as np

import tulip_tpu  # noqa: F401  (enables x64)
from tulip_tpu.ipm.data import make_lp_data
from tulip_tpu.ipm.hsd import (HSDOptions, _data_norms, max_step_length,
                               update_status)
from tulip_tpu.ipm import hsd as hsd_mod
from tulip_tpu.ipm.point import (Point, compute_residuals, starting_point,
                                 update_mu)
from tulip_tpu.status import TerminationStatus


def tiny_lp():
    """min x1 + 2 x2, s.t. x1 + x2 = 1, x1 - x2 = 0, 0 <= x <= 1."""
    A = [[1.0, 1.0], [1.0, -1.0]]
    return make_lp_data(A, b=[1.0, 0.0], c=[1.0, 2.0], c0=0.0,
                        l=[0.0, 0.0], u=[1.0, 1.0])


def test_residuals_tiny_lp():
    dat = tiny_lp()
    pt = Point(
        x=jnp.array([0.5, 0.5]), xl=jnp.array([0.5, 0.5]),
        xu=jnp.array([0.5, 0.5]), y=jnp.array([1.5, -0.5]),
        zl=jnp.array([0.0, 0.0]), zu=jnp.array([0.0, 0.0]),
        tau=jnp.asarray(1.0), kappa=jnp.asarray(0.0), mu=jnp.asarray(0.0))
    res = compute_residuals(dat, pt)
    # At the optimum with tau=1, kappa=0 everything vanishes:
    # rp = b - Ax = 0; rl = l - (x - xl) = 0; ru = u - (x + xu) = 0;
    # rd = c - A'y - zl + zu = 0; rg = c'x - b'y + kappa = 1.5 - 1.5 = 0.
    np.testing.assert_allclose(np.asarray(res.rp), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(res.rl), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(res.ru), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(res.rd), 0.0, atol=1e-14)
    assert abs(float(res.rg)) < 1e-14


def test_residuals_scaled_by_tau():
    dat = tiny_lp()
    pt = starting_point(dat)
    pt = pt._replace(tau=jnp.asarray(2.0))
    res = compute_residuals(dat, pt)
    # rp = tau*b - A x with x = 0 -> 2*b.
    np.testing.assert_allclose(np.asarray(res.rp), [2.0, 0.0], atol=1e-14)
    # rl = -x + xl + tau*l = xl (l = 0) -> 1.
    np.testing.assert_allclose(np.asarray(res.rl), [1.0, 1.0], atol=1e-14)
    # ru = -x - xu + tau*u = -1 + 2 = 1.
    np.testing.assert_allclose(np.asarray(res.ru), [1.0, 1.0], atol=1e-14)


def test_max_step_length_cases():
    """Edge cases (reference: test/IPM/HSD.jl max_step_length tests)."""
    dat = make_lp_data(np.zeros((1, 2)), [0.0], [0.0, 0.0], 0.0,
                       l=[0.0, 0.0], u=[np.inf, np.inf])

    def mk(x, dx):
        z = jnp.zeros(2)
        return (Point(x=z, xl=jnp.asarray(x), xu=z, y=jnp.zeros(1),
                      zl=jnp.ones(2), zu=z, tau=jnp.asarray(1.0),
                      kappa=jnp.asarray(1.0), mu=jnp.asarray(1.0)),
                Point(x=z, xl=jnp.asarray(dx), xu=z, y=jnp.zeros(1),
                      zl=jnp.zeros(2), zu=z, tau=jnp.asarray(0.0),
                      kappa=jnp.asarray(0.0), mu=jnp.asarray(0.0)))

    # No negative direction -> step 1.
    pt, d = mk([1.0, 1.0], [1.0, 0.0])
    assert float(max_step_length(dat, pt, d)) == 1.0
    # Blocking coordinate: x=1, dx=-2 -> alpha = 0.5.
    pt, d = mk([1.0, 1.0], [-2.0, 0.0])
    assert abs(float(max_step_length(dat, pt, d)) - 0.5) < 1e-14
    # tau blocking: dtau < 0.
    pt, d = mk([1.0, 1.0], [0.0, 0.0])
    d = d._replace(tau=jnp.asarray(-4.0))
    assert abs(float(max_step_length(dat, pt, d)) - 0.25) < 1e-14
    # kappa blocking.
    pt, d = mk([1.0, 1.0], [0.0, 0.0])
    d = d._replace(kappa=jnp.asarray(-2.0))
    assert abs(float(max_step_length(dat, pt, d)) - 0.5) < 1e-14


def test_update_status_plants_optimal():
    """Planting a (scaled) optimal point must flag Trm_Optimal
    (reference: test/IPM/HSD.jl convergence tests)."""
    dat = tiny_lp()
    t = 2.0
    pt = Point(
        x=jnp.array([0.5, 0.5]) * t, xl=jnp.array([0.5, 0.5]) * t,
        xu=jnp.array([0.5, 0.5]) * t, y=jnp.array([1.5, -0.5]) * t,
        zl=jnp.array([0.0, 0.0]), zu=jnp.array([0.0, 0.0]),
        tau=jnp.asarray(t), kappa=jnp.asarray(0.0), mu=jnp.asarray(0.0))
    pt = update_mu(pt, dat)
    res = compute_residuals(dat, pt)
    opts = HSDOptions()
    state = hsd_mod.init_state(dat, __import__(
        "tulip_tpu.kkt", fromlist=["make_backend"]).make_backend())
    state = state._replace(pt=pt, res=res)
    state = update_status(dat, opts, _data_norms(dat), state)
    assert int(state.status) == int(TerminationStatus.OPTIMAL)


def test_starting_point_masks():
    dat = make_lp_data(np.ones((1, 3)), [1.0], [1.0, 1.0, 1.0], 0.0,
                       l=[0.0, -np.inf, 0.0], u=[np.inf, np.inf, 2.0])
    pt = starting_point(dat)
    np.testing.assert_allclose(np.asarray(pt.xl), [1.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(pt.xu), [0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(pt.zl), [1.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(pt.zu), [0.0, 0.0, 1.0])
    # mu = (xl'zl + xu'zu + tau*kappa)/(p+1) = (2 + 1 + 1)/4 = 1.
    assert abs(float(pt.mu) - 1.0) < 1e-14
