"""Shared four-configuration parametrization for the conformance battery.

The reference runs its entire MOI.Test suite in four configurations
(reference: test/Interfaces/MOI_wrapper.jl:24-92). Here every conformance
module installs :func:`make_x4_fixture` as a module-level autouse fixture,
so each behavior executes under {HSD, MPC} x {presolve on, presolve off}.

Tests that pin their own algorithm/presolve level simply override the
fixture's defaults after model construction (the patch only changes the
*defaults* a fresh ``Parameters()`` starts with).
"""

import pytest

import tulip_tpu as tlp

CONFIGS = [("HSD", 1), ("HSD", 0), ("MPC", 1), ("MPC", 0)]
IDS = [f"{a}-ps{p}" for a, p in CONFIGS]


def make_x4_fixture():
    """Build the parametrized autouse fixture a conformance module installs
    with ``_x4 = make_x4_fixture()``."""

    @pytest.fixture(autouse=True, params=CONFIGS, ids=IDS)
    def _x4_config(request, monkeypatch):
        algo, ps = request.param
        orig_init = tlp.Model.__init__

        def patched_init(self, params=None):
            orig_init(self, params)
            if params is None:
                self.params.IPM.Algorithm = algo
                self.params.Presolve.Level = ps

        monkeypatch.setattr(tlp.Model, "__init__", patched_init)
        yield request.param

    return _x4_config
