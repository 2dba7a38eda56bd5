"""Host-loop error taxonomy: the reference maps OutOfMemory →
Trm_MemoryLimit and InterruptException → Trm_Unknown around the IPM loop
instead of crashing (reference: src/IPM/HSD/HSD.jl:319-339). The
device-side analogue (PosDef/Singular → NUMERICAL_PROBLEM) is handled
in-graph by the ok-flag regularization ladder; these tests cover the
host-side exceptions."""

import numpy as np
import pytest

import tulip_tpu as tlp
import tulip_tpu.model as model_mod
from tulip_tpu.status import TerminationStatus


def _small_model():
    m = tlp.Model()
    pb = m.pbdata
    for j in range(2):
        pb.add_variable((), (), 1.0, 0.0, 10.0, f"x{j}")
    pb.add_constraint([0, 1], [1.0, 1.0], 1.0, 1.0, "c0")
    return m


class _FakeXlaOom(Exception):
    pass


def test_oom_maps_to_memory_limit(monkeypatch):
    m = _small_model()

    def boom(*a, **k):
        raise _FakeXlaOom(
            "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
            "137438953472 bytes")

    monkeypatch.setattr(model_mod, "hsd_solve", boom)
    st = m.optimize()
    assert st == TerminationStatus.MEMORY_LIMIT
    assert m.status == TerminationStatus.MEMORY_LIMIT
    assert m.solve_time > 0.0


def test_host_memoryerror_maps_to_memory_limit(monkeypatch):
    m = _small_model()

    def boom(*a, **k):
        raise MemoryError()

    monkeypatch.setattr(model_mod, "hsd_solve", boom)
    assert m.optimize() == TerminationStatus.MEMORY_LIMIT


def test_interrupt_maps_to_unknown(monkeypatch):
    m = _small_model()

    def boom(*a, **k):
        raise KeyboardInterrupt()

    monkeypatch.setattr(model_mod, "hsd_solve", boom)
    st = m.optimize()
    assert st == TerminationStatus.UNKNOWN


def test_mpc_path_same_taxonomy(monkeypatch):
    m = _small_model()
    m.params.IPM.Algorithm = "MPC"

    def boom(*a, **k):
        raise _FakeXlaOom("RESOURCE_EXHAUSTED")

    monkeypatch.setattr(model_mod, "mpc_solve", boom)
    assert m.optimize() == TerminationStatus.MEMORY_LIMIT


def test_other_exceptions_propagate(monkeypatch):
    """Reference rethrows anything it does not recognize (HSD.jl:335-337)."""
    m = _small_model()

    def boom(*a, **k):
        raise RuntimeError("unrelated failure")

    monkeypatch.setattr(model_mod, "hsd_solve", boom)
    with pytest.raises(RuntimeError, match="unrelated"):
        m.optimize()


def test_normal_solve_unaffected():
    m = _small_model()
    assert m.optimize() == TerminationStatus.OPTIMAL
    assert np.isclose(tlp.get_attribute(m, "ObjectiveValue"), 1.0)


def test_certificate_tol_scales_with_resolved_options():
    """The ray-validation gate follows the solve's tolerances and dtype
    instead of a hard-coded 1e-5 (round-4 review)."""
    import numpy as np

    from tulip_tpu import Parameters
    from tulip_tpu.model import _certificate_tol

    p = Parameters()
    assert abs(_certificate_tol(p) - 100 * np.sqrt(np.finfo(np.float64).eps)
               ) < 1e-12

    p.ArithmeticDtype = "float32"
    p.IPM.ToleranceIFeas = 3e-4
    assert _certificate_tol(p) == pytest.approx(3e-2)

    p2 = Parameters()
    for f in ("TolerancePFeas", "ToleranceDFeas",
              "ToleranceRGap", "ToleranceIFeas"):
        setattr(p2.IPM, f, 1e-12)
    assert _certificate_tol(p2) == pytest.approx(1e-10)
