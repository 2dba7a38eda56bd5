"""Double-double arithmetic + extended-precision KKT backend tests.

The reference proves its any-precision path by running the suite in
BigFloat (reference: test/runtests.jl:9); here the equivalent capability is
double-word (f64×2) arithmetic, checked against exact rational arithmetic
(fractions.Fraction) and an ill-conditioned forward-error experiment.
"""

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tulip_tpu.kkt import DenseK1Backend, ExtendedK1Backend
from tulip_tpu.kkt.testkit import run_ls_tests
from tulip_tpu.ops import doubledouble as dd


def exact_dot(a, b):
    return sum((Fraction(float(x)) * Fraction(float(y))
                for x, y in zip(a, b)), Fraction(0))


def dd_to_fraction(x):
    return Fraction(float(x[0])) + Fraction(float(x[1]))


def test_error_free_transforms_exact():
    """two_sum/two_prod are EXACT (error-free) under jit on this platform —
    the foundation everything else rests on."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal(256) * 10.0 ** rng.integers(-20, 20, 256)
    b = rng.standard_normal(256) * 10.0 ** rng.integers(-20, 20, 256)
    s, e = jax.jit(dd.two_sum)(jnp.asarray(a), jnp.asarray(b))
    p, f = jax.jit(dd.two_prod)(jnp.asarray(a), jnp.asarray(b))
    for i in range(256):
        assert Fraction(float(s[i])) + Fraction(float(e[i])) \
            == Fraction(a[i]) + Fraction(b[i])
        assert Fraction(float(p[i])) + Fraction(float(f[i])) \
            == Fraction(a[i]) * Fraction(b[i])


def test_dd_mul_add_accuracy():
    """dd ops keep ~1e-31 relative accuracy (vs 1e-16 for f64)."""
    rng = np.random.default_rng(1)
    for _ in range(50):
        xh, yh = rng.standard_normal(2)
        x = dd.mul_ff(xh, 1.0 + 1e-17)  # non-trivial lo limbs
        y = dd.mul_ff(yh, 1.0 - 3e-17)
        fx, fy = dd_to_fraction(x), dd_to_fraction(y)
        for got, want in ((dd.add(x, y), fx + fy),
                          (dd.sub(x, y), fx - fy),
                          (dd.mul(x, y), fx * fy),
                          (dd.mul_f(x, yh), fx * Fraction(yh))):
            err = abs(dd_to_fraction(got) - want)
            assert err <= abs(want) * Fraction(1, 10 ** 30)


def test_dot_cancellation():
    """Compensated dot survives catastrophic cancellation that destroys the
    plain f64 dot."""
    rng = np.random.default_rng(2)
    a = rng.standard_normal(64)
    # Append (huge, -huge) pairs: exact contribution zero, f64 dot ruined.
    a = np.concatenate([a, np.array([1e15, -1e15, 3e14, -3e14])])
    b = rng.standard_normal(68)
    b[-4:] = [1.0, 1.0, 1.0, 1.0]
    exact = exact_dot(a, b)
    got = dd_to_fraction(jax.jit(dd.dot)(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - exact) <= abs(exact) * Fraction(1, 10 ** 25)
    plain = Fraction(float(np.dot(a, b)))
    assert abs(plain - exact) > abs(got - exact)  # and f64 really is worse


def test_matvec_matches_exact():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((7, 33)) * 10.0 ** rng.integers(-8, 8, (7, 33))
    x = rng.standard_normal(33)
    h, lo = jax.jit(dd.matvec)(jnp.asarray(A), jnp.asarray(x))
    for i in range(7):
        exact = exact_dot(A[i], x)
        got = Fraction(float(h[i])) + Fraction(float(lo[i]))
        tol = max(abs(Fraction(float(v))) for v in A[i]) * Fraction(1, 10**26)
        assert abs(got - exact) <= tol


def test_extended_backend_contract():
    A = jnp.asarray(np.array([[1.0, 0.0, 2.0, -1.0],
                              [0.0, 1.0, -1.0, 3.0]]))
    run_ls_tests(A, ExtendedK1Backend(), atol=1e-12)


def test_extended_backend_forward_error_ill_conditioned():
    """On a KKT system with θ spanning 16 orders of magnitude (the late-IPM
    regime, cond(K) ≈ 1/eps), dd-residual refinement recovers ~eps forward
    error while plain f64 refinement stalls at cond(K)·eps."""
    rng = np.random.default_rng(4)
    m, n = 12, 30
    A = jnp.asarray(rng.standard_normal((m, n)))
    theta_inv = jnp.asarray(10.0 ** rng.uniform(-8, 8, n))
    regP = jnp.full(n, 1e-8)
    regD = jnp.full(m, 1e-8)
    xi_p = jnp.asarray(rng.standard_normal(m))
    xi_d = jnp.asarray(rng.standard_normal(n))

    # Reference solution in 80-bit extended precision (x86 long double).
    Al = np.asarray(A, dtype=np.longdouble)
    tl = np.asarray(theta_inv, dtype=np.longdouble) + 1e-8
    K2 = np.zeros((n + m, n + m), dtype=np.longdouble)
    K2[:n, :n] = -np.diag(tl)
    K2[:n, n:] = Al.T
    K2[n:, :n] = Al
    K2[n:, n:] = np.diag(np.full(m, 1e-8, dtype=np.longdouble))
    # np.linalg.solve downcasts; do Gaussian elimination in longdouble.
    rhs = np.concatenate([np.asarray(xi_d, dtype=np.longdouble),
                          np.asarray(xi_p, dtype=np.longdouble)])
    M = np.hstack([K2, rhs[:, None]])
    for k in range(n + m):
        piv = k + np.argmax(np.abs(M[k:, k]))
        M[[k, piv]] = M[[piv, k]]
        M[k] = M[k] / M[k, k]
        M[k + 1:] -= np.outer(M[k + 1:, k], M[k])
    sol = np.zeros(n + m, dtype=np.longdouble)
    for k in range(n + m - 1, -1, -1):
        sol[k] = M[k, -1] - M[k, k + 1:n + m] @ sol[k + 1:]
    ref_dx, ref_dy = sol[:n], sol[n:]

    def err(backend):
        st = backend.setup(A)
        st, ok = backend.update(st, theta_inv, regP, regD)
        assert bool(ok)
        dx, dy = backend.solve(st, xi_p, xi_d)
        e = np.concatenate([np.asarray(dx, np.longdouble) - ref_dx,
                            np.asarray(dy, np.longdouble) - ref_dy])
        return float(np.max(np.abs(e)) / np.max(np.abs(sol)))

    e_plain = err(DenseK1Backend())
    e_ext = err(ExtendedK1Backend())
    assert e_ext < 1e-13
    assert e_ext < e_plain / 10


def test_extended_end_to_end_tight_tolerance():
    """Full HSD solve at 1e-12 tolerances (far below the √eps default the
    reference uses for Float64) through the extended backend."""
    from scipy.optimize import linprog

    import tulip_tpu as tlp

    rng = np.random.default_rng(5)
    m, n = 20, 40
    A = rng.standard_normal((m, n))
    u = rng.uniform(1, 4, n)
    b = A @ (u * rng.uniform(0.2, 0.8, n))
    c = rng.standard_normal(n)

    mdl = tlp.Model()
    pb = mdl.pbdata
    cols = [pb.add_variable((), (), c[j], 0.0, u[j], f"x{j}")
            for j in range(n)]
    for i in range(m):
        pb.add_constraint(cols, list(A[i]), b[i], b[i], f"r{i}")
    mdl.params.KKT.Backend = "extended"
    for t in ("PFeas", "DFeas", "RGap", "IFeas"):
        setattr(mdl.params.IPM, f"Tolerance{t}", 1e-12)
    st = mdl.optimize()
    assert st == tlp.TerminationStatus.OPTIMAL

    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, ub) for ub in u],
                  method="highs")
    z = tlp.get_attribute(mdl, "ObjectiveValue")
    zd = tlp.get_attribute(mdl, "DualObjectiveValue")
    assert abs(z - ref.fun) < 1e-9 * max(1, abs(ref.fun))
    assert abs(z - zd) < 1e-10 * max(1, abs(z))  # gap actually closed tight
