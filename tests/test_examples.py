"""End-to-end example LPs as integration tests.

Mirrors the reference's examples-as-tests pattern (reference:
test/examples.jl, examples/{optimal,infeasible,unbounded,freevars}.jl):
four behaviors (optimal / primal infeasible / unbounded / free variables),
run for both IPM algorithms and both arithmetics where meaningful, with
certificate checks.
"""

import os

import numpy as np
import pytest

import tulip_tpu as tlp
from tulip_tpu.status import SolutionStatus, TerminationStatus

DATA = os.path.join(os.path.dirname(__file__), "data")


def make_model(algorithm, dtype="float64", backend=None):
    m = tlp.Model()
    m.params.IPM.Algorithm = algorithm
    m.params.ArithmeticDtype = dtype
    if backend:
        m.params.KKT.Backend = backend
    return m


ALGOS = ["HSD", "MPC"]


@pytest.mark.parametrize("algo", ALGOS)
def test_optimal(algo):
    """min x1+2x2 st x1+x2=1, x1-x2=0, 0<=x<=1 -> z*=1.5 at (.5,.5)
    (reference: examples/optimal.jl)."""
    m = make_model(algo)
    tlp.load_problem(m, os.path.join(DATA, "lp_opt.mps"))
    st = m.optimize()
    assert st == TerminationStatus.OPTIMAL
    z = tlp.get_attribute(m, "ObjectiveValue")
    assert abs(z - 1.5) < 1e-6
    assert m.solution.primal_status == SolutionStatus.OPTIMAL
    assert m.solution.dual_status == SolutionStatus.OPTIMAL
    np.testing.assert_allclose(m.solution.x, [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(m.solution.Ax, [1.0, 0.0], atol=1e-6)
    # Duals: y = (1.5, -0.5), s = 0 (reference: examples/optimal.jl:52-62).
    y = m.solution.y_lower - m.solution.y_upper
    s = m.solution.s_lower - m.solution.s_upper
    np.testing.assert_allclose(y, [1.5, -0.5], atol=1e-6)
    np.testing.assert_allclose(s, [0.0, 0.0], atol=1e-6)
    zd = tlp.get_attribute(m, "DualObjectiveValue")
    assert abs(zd - 1.5) < 1e-6


@pytest.mark.parametrize("algo", ALGOS)
def test_infeasible(algo):
    """x1+x2=1, x1-x2=0, x2=1, x>=0 is primal infeasible
    (reference: examples/infeasible.jl)."""
    m = make_model(algo)
    tlp.load_problem(m, os.path.join(DATA, "lp_inf.mps"))
    st = m.optimize()
    assert st == TerminationStatus.PRIMAL_INFEASIBLE
    assert m.solution.dual_status == SolutionStatus.INFEASIBILITY_CERTIFICATE
    assert m.solution.is_dual_ray
    # Farkas ray: b'y + l'zl - u'zu > 0 with A'y + zl - zu ~ 0.
    y = m.solution.y_lower - m.solution.y_upper
    assert y[0] * 1.0 + y[2] * 1.0 + np.dot(
        np.zeros(2), m.solution.s_lower) > 1e-8


@pytest.mark.parametrize("algo", ALGOS)
def test_unbounded(algo):
    """min -x1-x2 st x1-x2=1, x>=0 is unbounded
    (reference: examples/unbounded.jl)."""
    m = make_model(algo)
    tlp.load_problem(m, os.path.join(DATA, "lp_ubd.mps"))
    st = m.optimize()
    assert st == TerminationStatus.DUAL_INFEASIBLE
    assert m.solution.primal_status == SolutionStatus.INFEASIBILITY_CERTIFICATE
    assert m.solution.is_primal_ray
    # Unbounded ray: A x ~ 0, c'x < 0, x >= 0.
    x = m.solution.x
    assert x[0] >= -1e-9 and x[1] >= -1e-9
    assert abs(x[0] - x[1]) < 1e-6 * max(1.0, abs(x[0]))
    assert -(x[0] + x[1]) < -1e-9


@pytest.mark.parametrize("algo", ALGOS)
def test_freevars(algo):
    """All-free-variable LP, z* = 0 (reference: examples/freevars.jl)."""
    m = make_model(algo)
    tlp.load_problem(m, os.path.join(DATA, "lp_freevars.mps"))
    st = m.optimize()
    assert st == TerminationStatus.OPTIMAL
    z = tlp.get_attribute(m, "ObjectiveValue")
    assert abs(z) < 1e-6


@pytest.mark.parametrize("backend", ["dense", "dense-ldl", "cg", "minres"])
def test_optimal_all_backends(backend):
    """The same optimal LP through every KKT backend."""
    m = make_model("HSD", backend=backend)
    tlp.load_problem(m, os.path.join(DATA, "lp_opt.mps"))
    st = m.optimize()
    assert st == TerminationStatus.OPTIMAL
    z = tlp.get_attribute(m, "ObjectiveValue")
    assert abs(z - 1.5) < 1e-6


def test_optimal_f32():
    """f32 solve with iterative refinement reaches f32-grade tolerance."""
    m = make_model("HSD", dtype="float32")
    m.params.KKT.RefinementSteps = 2
    tlp.load_problem(m, os.path.join(DATA, "lp_opt.mps"))
    st = m.optimize()
    assert st == TerminationStatus.OPTIMAL
    z = tlp.get_attribute(m, "ObjectiveValue")
    assert abs(z - 1.5) < 1e-3


def test_maximization():
    """max x1 + 2 x2 st x1 + x2 <= 1, x >= 0 -> z* = 2 at (0, 1), solved
    through the objective flip (reference: src/IPM/ipmdata.jl:130-135)."""
    m = make_model("HSD")
    pb = m.pbdata
    pb.objsense = False
    x1 = pb.add_variable((), (), 1.0, 0.0, float("inf"))
    x2 = pb.add_variable((), (), 2.0, 0.0, float("inf"))
    pb.add_constraint([x1, x2], [1.0, 1.0], -float("inf"), 1.0)
    st = m.optimize()
    assert st == TerminationStatus.OPTIMAL
    z = tlp.get_attribute(m, "ObjectiveValue")
    assert abs(z - 2.0) < 1e-6
    zd = tlp.get_attribute(m, "DualObjectiveValue")
    assert abs(zd - 2.0) < 1e-6
    np.testing.assert_allclose(m.solution.x, [0.0, 1.0], atol=1e-6)


def test_iteration_limit():
    m = make_model("HSD")
    tlp.load_problem(m, os.path.join(DATA, "lp_opt.mps"))
    tlp.set_parameter(m, "IPM_IterationsLimit", 0)
    st = m.optimize()
    assert st == TerminationStatus.ITERATION_LIMIT
