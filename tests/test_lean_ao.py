"""Lean-AO mode: SCF without persistent f64 AO planes.

At the 117-atom north-star scale with a level-1 grid, the f64 AO+grad
planes are ~6.5 GB of HBM that the f64 XC path touches only O(1) times
per SCF (delta anchors, final parity energy).  Lean mode
(kohn_sham.prepare(lean_ao=True)) keeps only the packed f32 Pallas
planes and streams on-device f64 AO chunks for the anchor evaluations
(engine.xc_engine.xc_step_onfly); the delta64 endgame re-materializes
the f64 planes once while dropping the then-unused packed planes.

The streamed evaluator reuses ao_eval._eval_chunk, so AO values are
bitwise those of the plane path; energies agree to summation-order
roundoff (~1e-13).
"""

import jax.numpy as jnp
import pytest

from quantum_compute_dft_tpu import kohn_sham
from quantum_compute_dft_tpu.mol import from_atoms
from quantum_compute_dft_tpu.scf.driver import (
    _PALLAS_PACK_CACHE,
    initial_guess,
    scf_host_staged,
)

H2O = [
    ("O", (0.0, 0.0, 0.127)),
    ("H", (0.0, 0.758, -0.509)),
    ("H", (0.0, -0.758, -0.509)),
]

# all three cases are small H2O SCFs -> fast tier (no marker needed)


def test_streamed_xc_matches_planes():
    """xc_step_onfly == xc_step to roundoff (same _eval_chunk math)."""
    from quantum_compute_dft_tpu.engine.ao_eval import device_tables
    from quantum_compute_dft_tpu.engine.xc_engine import (
        xc_step,
        xc_step_onfly,
    )

    setup = kohn_sham.prepare(from_atoms(H2O), "GGA", grid_level=1)
    sys = setup.sys
    dm = initial_guess(sys)
    e_ref, v_ref = xc_step(setup.functional, dm, sys.ao, sys.weights,
                           sys.ao_grad)
    from quantum_compute_dft_tpu.basis import build_basis

    tables = device_tables(build_basis(from_atoms(H2O)))
    coords = jnp.asarray(setup.grid.coords)
    e_s, v_s = xc_step_onfly(setup.functional, dm, coords, sys.weights,
                             tables)
    assert abs(float(e_s - e_ref)) < 1e-11
    assert float(jnp.max(jnp.abs(v_s - v_ref))) < 1e-11


def test_lean_scf_matches_default():
    """Full f64 SCF in lean mode matches the plane-path energy."""
    mol = from_atoms(H2O)
    s0 = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True)
    r0 = scf_host_staged(s0.sys, s0.functional, xc_impl="f64")
    s1 = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True,
                           lean_ao=True)
    assert s1.sys.ao is None and s1.sys.ao_tables is not None
    r1 = scf_host_staged(s1.sys, s1.functional, xc_impl="f64")
    assert r1.converged and r0.converged
    assert abs(float(r1.e_tot) - float(r0.e_tot)) < 1e-12


def test_lean_delta64_endgame_materializes(monkeypatch):
    """Interpreter-mode mixed SCF with the forced delta64 endgame: the
    packed planes must be dropped and the energy must stay inside the
    mixed-schedule tolerance."""
    import quantum_compute_dft_tpu.engine.pallas_xc as px

    monkeypatch.setenv("DFT_PALLAS_INTERPRET", "1")
    orig = px.pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(px.pl, "pallas_call", patched)

    mol = from_atoms(H2O)
    s = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True,
                          lean_ao=True)
    ref = scf_host_staged(
        kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True).sys,
        s.functional, xc_impl="f64",
    )
    r = scf_host_staged(s.sys, s.functional, xc_impl="mixed",
                        xc64_tail="on")
    assert r.converged
    assert s.sys not in _PALLAS_PACK_CACHE  # endgame dropped the pack
    assert abs(float(r.e_tot) - float(ref.e_tot)) < 1e-6


def test_lean_delta64_endgame_streams_over_budget(monkeypatch):
    """When the f64 planes exceed the HBM budget (forced here with a
    zero budget), the delta64 endgame must keep the streamed on-device
    AO path instead of materializing planes -- the 117-atom L1-grid
    case, where 6.6 GB of planes on top of the DF factors OOMs the
    chip -- and still converge to the same energy."""
    import quantum_compute_dft_tpu.engine.pallas_xc as px
    import quantum_compute_dft_tpu.scf.driver as drv

    monkeypatch.setenv("DFT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DFT_DELTA64_PLANES_BYTES", "0")
    orig = px.pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(px.pl, "pallas_call", patched)

    def boom(*a, **k):
        raise AssertionError("materialized planes despite zero budget")

    monkeypatch.setattr(drv, "_materialize_xc_planes", boom)

    mol = from_atoms(H2O)
    s = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True,
                          lean_ao=True)
    ref = scf_host_staged(
        kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True).sys,
        s.functional, xc_impl="f64",
    )
    r = scf_host_staged(s.sys, s.functional, xc_impl="mixed",
                        xc64_tail="on")
    assert r.converged
    assert s.sys not in _PALLAS_PACK_CACHE  # pack still dropped
    assert abs(float(r.e_tot) - float(ref.e_tot)) < 1e-6
