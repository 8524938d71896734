"""Auxiliary subsystem tests: checkpoint/resume, profiling, staged SCF, CLI."""

import os

import numpy as np
import pytest

from quantum_compute_dft_tpu import kohn_sham
from quantum_compute_dft_tpu.mol import from_atoms
from quantum_compute_dft_tpu.scf import (
    load_checkpoint,
    save_checkpoint,
    scf_host,
    scf_host_staged,
)
from quantum_compute_dft_tpu.utils import PhaseTimer

H2O = [
    ("O", (0.0, 0.0, 0.127)),
    ("H", (0.0, 0.758, -0.509)),
    ("H", (0.0, -0.758, -0.509)),
]


@pytest.fixture(scope="module")
def setup():
    return kohn_sham.prepare(from_atoms(H2O), "LDA", grid_level=1)


def test_staged_matches_fused(setup):
    r1 = scf_host(setup.sys, setup.functional)
    r2 = scf_host_staged(setup.sys, setup.functional)
    assert r1.converged and r2.converged
    assert abs(r1.e_tot - r2.e_tot) < 1e-9


def test_checkpoint_roundtrip_and_resume(setup, tmp_path):
    res = scf_host(setup.sys, setup.functional)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, res.dm, res.e_tot, res.n_iter, "LDA", "H2O")
    ck = load_checkpoint(p)
    assert ck["functional"] == "LDA"
    assert abs(ck["e_tot"] - res.e_tot) < 1e-12
    # resuming from the converged density converges immediately
    res2 = scf_host(setup.sys, setup.functional, dm0=ck["dm"])
    assert res2.converged
    assert res2.n_iter <= 3
    assert abs(res2.e_tot - res.e_tot) < 1e-8


def test_midrun_checkpoint_resume(setup, tmp_path):
    """Periodic mid-run checkpointing (round 5): interrupt the staged
    loop after a few cycles via max_cycle, with a periodic saver firing
    every 2 cycles; resuming from the last saved (non-converged) density
    must reproduce the uninterrupted run's converged energy to 1e-8."""
    from quantum_compute_dft_tpu.scf.checkpoint import periodic_saver

    p = str(tmp_path / "mid.npz")
    r_full = scf_host_staged(setup.sys, setup.functional)
    # "crash" at cycle 4: the run is cut off unconverged, but the saver
    # has checkpointed the in-progress density
    r_cut = scf_host_staged(
        setup.sys, setup.functional, max_cycle=4,
        checkpoint_cb=periodic_saver(p, "LDA", "H2O"),
        checkpoint_every=2,
    )
    assert not r_cut.converged and os.path.exists(p)
    ck = load_checkpoint(p)
    assert 0 < ck["cycle"] <= 4
    r_res = scf_host_staged(setup.sys, setup.functional, dm0=ck["dm"])
    assert r_res.converged
    assert r_res.n_iter < r_full.n_iter  # warm start saves cycles
    assert abs(r_res.e_tot - r_full.e_tot) < 1e-8


def test_phase_timer(setup):
    timer = PhaseTimer()
    scf_host_staged(setup.sys, setup.functional, timer=timer)
    assert timer.avg_ms("xc") > 0
    assert timer.avg_ms("coulomb") >= 0
    assert "xc" in timer.report()


def test_cli_checkpoint_flow(tmp_path, capsys):
    from quantum_compute_dft_tpu.cli import main

    xyz = tmp_path / "h2.xyz"
    xyz.write_text("2\nH2\nH 0 0 0\nH 0 0 0.74084823\n")
    ck = str(tmp_path / "h2.npz")
    rc = main(["LDA", str(xyz), "--grid-level", "1", "--checkpoint", ck])
    assert rc == 0 and os.path.exists(ck)
    rc = main(["LDA", str(xyz), "--grid-level", "1", "--checkpoint", ck])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Resuming from checkpoint" in out


def test_graft_entry_single_chip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import jax

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(float(out[2]))


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
