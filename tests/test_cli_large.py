"""Large instances through the USER ENTRY POINT: MPS writer → .mps.gz →
CLI → auto-probed structured backend → objective parity.

The reference exercises its CLI on real Netlib files
(reference: app/precompile_app.jl:12-17); this image is zero-egress, so
the m ≥ 2048 golden families stand in. Unlike tests/test_large_scale.py
(which loads in-memory), these solve through `python -m tulip_tpu.cli`
semantics: reader (native tokenizer), gz decompression, parameter
routing, auto-probe, and the result summary line.
"""

import re

import numpy as np
import pytest

import tulip_tpu.cli as cli
from golden_large import block_angular_lp, highs_optimum, load_model
from test_large_scale import staircase_lp
from tulip_tpu.io.mps import write_mps

pytestmark = pytest.mark.slow


def _roundtrip_cli(tmp_path, capsys, A, b, c, u, name, extra_args=()):
    mod = load_model(A, b, c, u, name=name)
    path = str(tmp_path / f"{name}.mps.gz")
    write_mps(mod.pbdata, path)
    rc = cli.main([*extra_args, path])
    out = capsys.readouterr().out
    assert rc == 0, out
    mline = re.search(r"result: (\w+) objective ([\d.eE+-]+)", out)
    assert mline is not None, out
    assert mline.group(1) == "OPTIMAL"
    z_cli = float(mline.group(2))
    z_ref = highs_optimum(A, b, c, u)
    assert abs(z_cli - z_ref) <= 1e-7 * max(1.0, abs(z_ref)), (z_cli, z_ref)
    return out


def test_cli_staircase_2048(tmp_path, capsys):
    A, b, c, u = staircase_lp(2048)
    out = _roundtrip_cli(tmp_path, capsys, A, b, c, u, "cli-stair2048")
    assert "banded" in out or "sparse" in out   # structured probe engaged


def test_cli_dense_column_2048(tmp_path, capsys):
    A, b, c, u = staircase_lp(2048, dense_cols=1, seed=1)
    out = _roundtrip_cli(tmp_path, capsys, A, b, c, u, "cli-densecol2048")
    assert "sparse-smw" in out                  # dense-column splitting


def test_cli_block_angular(tmp_path, capsys):
    A, b, c, u = block_angular_lp()
    _roundtrip_cli(tmp_path, capsys, A, b, c, u, "cli-blockang")


def test_cli_mpc_on_large(tmp_path, capsys):
    """The --Method flag routes on a large instance too."""
    A, b, c, u = staircase_lp(2048, cyclic=True, seed=2)
    out = _roundtrip_cli(tmp_path, capsys, A, b, c, u, "cli-mpc2048",
                         extra_args=["--Method", "MPC"])
    assert "Optimizer info (MPC)" in out


def test_cli_sparse_first_flag(tmp_path, capsys):
    """--SparseFirst 1 forces the sparse-first data path through the full
    CLI pipeline (reader → COO standard form → tile plan → level solve);
    objective parity with HiGHS at 1e-8."""
    A, b, c, u = staircase_lp(2048)
    out = _roundtrip_cli(tmp_path, capsys, A, b, c, u, "sfcli2048",
                         extra_args=("--SparseFirst", "1"))
    # --SparseFirst 0 on the same instance: dense path (probe -> banded).
    A2, b2, c2, u2 = staircase_lp(2048, seed=1)
    _roundtrip_cli(tmp_path, capsys, A2, b2, c2, u2, "dncli2048",
                   extra_args=("--SparseFirst", "0"))
