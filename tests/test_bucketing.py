"""Shape bucketing (scf/bucketing.py) + shared-program mode tests.

The padding contract: a bucketized system must converge to the SAME
energy as the raw system (padded grid rows carry zero weight; padded
orbitals sit on a high-energy Hcore shelf, never occupied), and two
molecules in the same bucket must REUSE the compiled cycle programs
(the round-3 sweep paid 20-60 s of remote compiles per molecule because
the identity-hashed static SCFSystem baked its tensors into the HLO).
"""

import numpy as np
import pytest

from quantum_compute_dft_tpu import kohn_sham
from quantum_compute_dft_tpu.mol import from_atoms
from quantum_compute_dft_tpu.scf import bucketing
from quantum_compute_dft_tpu.scf.driver import (
    _cycle_tail_impl,
    _density,
    _scf_iteration_impl,
    initial_guess,
    scf_host_staged,
)

H2O = [
    ("O", (0.0, 0.0, 0.127)),
    ("H", (0.0, 0.758, -0.509)),
    ("H", (0.0, -0.758, -0.509)),
]
NH3 = [
    ("N", (0.0, 0.0, 0.116)),
    ("H", (0.0, 0.939, -0.271)),
    ("H", (0.813, -0.469, -0.271)),
    ("H", (-0.813, -0.469, -0.271)),
]


@pytest.fixture(scope="module")
def setups():
    return {
        "h2o": kohn_sham.prepare(from_atoms(H2O), "GGA", grid_level=1),
        "nh3": kohn_sham.prepare(from_atoms(NH3), "GGA", grid_level=1),
    }


def test_buckets_are_coarse():
    assert bucketing.nao_bucket(7) == 16
    assert bucketing.nao_bucket(16) == 16
    assert bucketing.nao_bucket(36) == 48
    assert bucketing.nao_bucket(170) == 192
    # 2x ladder: a handful of distinct grid shapes across the sweep range
    ladder = {bucketing.grid_bucket(g) for g in range(10_000, 700_000, 7919)}
    assert len(ladder) <= 5


def test_bucketized_energy_matches_raw(setups):
    s = setups["h2o"]
    raw = scf_host_staged(s.sys, s.functional)
    padded, (n, g) = bucketing.bucketize_system(s.sys)
    assert padded.shared_key is not None
    assert padded.hcore.shape[0] == bucketing.nao_bucket(n)
    assert padded.weights.shape[0] == bucketing.grid_bucket(g)
    res = scf_host_staged(padded, s.functional)
    assert res.converged
    assert abs(float(res.energy.e_tot) - float(raw.energy.e_tot)) < 1e-9
    # padded density block must be exactly untouched by the SCF
    dm = np.asarray(res.dm)
    assert np.abs(dm[n:, :]).max() < 1e-12


def test_same_bucket_reuses_compiled_programs(setups):
    s1, s2 = setups["h2o"], setups["nh3"]
    p1, _ = bucketing.bucketize_system(s1.sys, g_bucket=24576)
    p2, _ = bucketing.bucketize_system(s2.sys, g_bucket=24576)
    assert p1.shared_key == p2.shared_key  # nao 7/8 -> 8; forced grid rung
    r1 = scf_host_staged(p1, s1.functional)
    n_tail = _cycle_tail_impl._cache_size()
    r2 = scf_host_staged(p2, s2.functional)
    assert r1.converged and r2.converged
    # the second molecule must not have traced ANY new tail programs
    assert _cycle_tail_impl._cache_size() == n_tail
    # sanity: the energies are the molecules' own (different) energies
    assert abs(float(r1.energy.e_tot) - float(r2.energy.e_tot)) > 10.0


def test_dynamic_nocc_density_matches_static(setups):
    s = setups["h2o"]
    sys = s.sys
    dm0 = initial_guess(sys)
    import jax.numpy as jnp

    d_static = _density(sys.x, sys.hcore, sys.nocc)
    d_dyn = _density(sys.x, sys.hcore, jnp.asarray(sys.nocc, jnp.int32))
    assert float(abs(d_static - d_dyn).max()) < 1e-10
    assert dm0.shape == d_static.shape


def test_shared_iteration_matches_classic(setups):
    """scf_iteration through the _ArgSys shim == the classic static path."""
    from quantum_compute_dft_tpu.scf.driver import scf_iteration
    from quantum_compute_dft_tpu.scf.diis import diis_init

    s = setups["h2o"]
    padded, _ = bucketing.bucketize_system(s.sys)
    import dataclasses

    classic = dataclasses.replace(padded, shared_key=None)
    dm = initial_guess(padded)
    d1, _, eb1 = scf_iteration(padded, s.functional, dm,
                               diis_init(padded.hcore.shape[0]))
    d2, _, eb2 = scf_iteration(classic, s.functional, dm,
                               diis_init(classic.hcore.shape[0]))
    assert abs(float(eb1.e_tot) - float(eb2.e_tot)) < 1e-11
    assert float(abs(d1 - d2).max()) < 1e-10
