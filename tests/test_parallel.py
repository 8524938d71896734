"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest).

Exercises the grid-sharded psum path and the AO-row-sharded J/K builders
against the single-device reference results (SURVEY.md section 4 item d).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantum_compute_dft_tpu import kohn_sham
from quantum_compute_dft_tpu.engine.coulomb import coulomb_full, exchange_full
from quantum_compute_dft_tpu.engine.xc_engine import xc_step
from quantum_compute_dft_tpu.mol import from_atoms
from quantum_compute_dft_tpu.parallel import (
    grid_mesh,
    pad_to_multiple,
    shard_grid_arrays,
    sharded_fock_builders,
    sharded_xc_step,
)
from quantum_compute_dft_tpu.scf.driver import initial_guess

H2O = [
    ("O", (0.0, 0.0, 0.127)),
    ("H", (0.0, 0.758, -0.509)),
    ("H", (0.0, -0.758, -0.509)),
]


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mol = from_atoms(H2O)
    return kohn_sham.prepare(mol, "B3LYP", grid_level=1)


def test_sharded_xc_matches_single_device(setup):
    mesh = grid_mesh()
    dm = initial_guess(setup.sys)
    e_ref, v_ref = xc_step(
        setup.functional, dm, setup.sys.ao, setup.sys.weights, setup.sys.ao_grad
    )
    ao_s, w_s, g_s = shard_grid_arrays(
        mesh, setup.sys.ao, setup.sys.weights, setup.sys.ao_grad
    )
    fn = sharded_xc_step(mesh, setup.functional)
    e_sh, v_sh = fn(dm, ao_s, w_s, g_s)
    assert abs(float(e_sh) - float(e_ref)) < 1e-11
    assert float(jnp.abs(v_sh - v_ref).max()) < 1e-11


def test_sharded_jk_match_single_device(setup):
    mesh = grid_mesh()
    dm = initial_guess(setup.sys)
    nao = dm.shape[0]
    eri = np.asarray(setup.sys.eri)
    eri_pad = pad_to_multiple(eri, 8, 0)
    from jax.sharding import NamedSharding, PartitionSpec as P

    eri_s = jax.device_put(eri_pad, NamedSharding(mesh, P("grid", None, None, None)))
    jfn, kfn = sharded_fock_builders(mesh)
    j_sh = jfn(eri_s, dm)[:nao]
    k_sh = kfn(eri_s, dm)[:nao]
    j_ref = coulomb_full(setup.sys.eri, dm)
    k_ref = exchange_full(setup.sys.eri, dm)
    assert float(jnp.abs(j_sh - j_ref).max()) < 1e-11
    assert float(jnp.abs(k_sh - k_ref).max()) < 1e-11


@pytest.mark.slow
def test_sharded_df_jk_match_single_device():
    """Aux-sharded DF J/K == single-device DF J/K (same tensors, same
    metric factorization) to near roundoff."""
    from quantum_compute_dft_tpu.integrals.density_fitting import make_df_builders
    from quantum_compute_dft_tpu.parallel.sharded import sharded_df_builders

    mol = from_atoms(H2O)
    s_df = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True)
    dm = initial_guess(s_df.sys)
    jf, kf, _ = make_df_builders(s_df.sys.df_j3c, s_df.sys.df_v2c)
    j_ref, k_ref = jf(dm), kf(dm)
    mesh = grid_mesh()
    build_jk = sharded_df_builders(mesh, s_df.sys.df_j3c, s_df.sys.df_v2c)
    j_sh, k_sh = build_jk(dm)
    assert float(jnp.abs(j_sh - j_ref).max()) < 1e-10
    assert float(jnp.abs(k_sh - k_ref).max()) < 1e-10


@pytest.mark.slow
def test_sharded_df_scf_step_matches_single_device():
    """One full sharded DF-B3LYP SCF cycle == the single-device DF cycle
    to 1e-10 (VERDICT round-1 item 2)."""
    from quantum_compute_dft_tpu.parallel.sharded_scf import make_sharded_scf
    from quantum_compute_dft_tpu.scf.diis import diis_init
    from quantum_compute_dft_tpu.scf.driver import scf_iteration

    mol = from_atoms(H2O)
    s_df = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True)
    mesh = grid_mesh()
    step, dm0, diis0 = make_sharded_scf(mesh, s_df.sys, s_df.functional)
    dm_ref = initial_guess(s_df.sys)
    assert float(jnp.abs(dm0 - dm_ref).max()) < 1e-10
    dm_sh, diis_sh, e_sh = step(dm0, diis0)
    dm_1, _, eb = scf_iteration(
        s_df.sys, s_df.functional, dm_ref, diis_init(dm_ref.shape[0])
    )
    # single-step densities are not variationally protected: ~1e-11 Fock
    # differences amplify through the eigensolve; converged energies below
    # agree to 1e-10
    assert abs(float(e_sh) - float(eb.e_tot)) < 5e-9
    assert float(jnp.abs(dm_sh - dm_1).max()) < 1e-7

    # drive the sharded loop to the reference convergence rule and compare
    # against the converged single-device DF energy (VERDICT item 2)
    from quantum_compute_dft_tpu.parallel import shard_grid_arrays, sharded_xc_step
    from quantum_compute_dft_tpu.parallel.sharded import sharded_df_builders
    from quantum_compute_dft_tpu.scf.driver import energy_of_dm, scf_host

    r_ref = scf_host(s_df.sys, s_df.functional, conv_tol_d=1e-9)
    assert r_ref.converged
    dm, diis, e_old = dm0, diis0, 0.0
    for _ in range(100):
        dm_new, diis, e_tot = step(dm, diis)
        de = float(e_tot) - e_old
        dnorm = float(jnp.linalg.norm(dm_new - dm))
        dm, e_old = dm_new, float(e_tot)
        if abs(de) < 1e-8 and dnorm < 1e-9:
            break
    else:
        raise AssertionError("sharded DF-SCF did not converge")
    # converged fixed points agree to the eigensolve-conditioning bound
    # (the two iteration maps differ by ~1e-11 in F, amplified ~1/gap)
    assert float(jnp.linalg.norm(dm - r_ref.dm)) < 1e-8
    assert abs(e_old - r_ref.e_tot) < 5e-9

    # the exact statement of "sharded matches single-device to 1e-10": the
    # FULLY SHARDED energy assembly (DF J/K + grid-sharded XC, all psum'd)
    # at the SAME density equals the single-device energy functional
    e_ref_sc = energy_of_dm(s_df.sys, s_df.functional, r_ref.dm)
    build_jk = sharded_df_builders(mesh, s_df.sys.df_j3c, s_df.sys.df_v2c)
    xc_fn = sharded_xc_step(mesh, s_df.functional)
    ao_s, w_s, g_s = shard_grid_arrays(
        mesh, s_df.sys.ao, s_df.sys.weights, s_df.sys.ao_grad
    )
    j_sh, k_sh = build_jk(r_ref.dm)
    exc_sh, _ = xc_fn(r_ref.dm, ao_s, w_s, g_s)
    c_hf = s_df.functional.hyb_coeff
    e_sh_sc = (
        float(jnp.sum(r_ref.dm * s_df.sys.hcore))
        + 0.5 * float(jnp.sum(r_ref.dm * j_sh))
        + float(exc_sh)
        - 0.25 * c_hf * float(jnp.sum(r_ref.dm * k_sh))
        + s_df.sys.e_nuc
    )
    assert abs(e_sh_sc - float(e_ref_sc.e_tot)) < 1e-10


@pytest.mark.slow
def test_sharded_df_scf_converges_decane():
    """Mid-size sharded CONVERGENCE (VERDICT r2 item 1): Decane DF-B3LYP
    (nao=72, aux rank 5-8x nao) driven to the reference rule on the
    8-device mesh -- production-shape sharding, not an H2O toy.  Time-
    bounded via grid level 0 and the setup-artifact cache."""
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.parallel.sharded_scf import make_sharded_scf

    mol = from_xyz_file("molecules/Decane.xyz")
    s_df = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True)
    assert s_df.nao == 72
    mesh = grid_mesh()
    step, dm, diis = make_sharded_scf(mesh, s_df.sys, s_df.functional)
    e_old, converged = 0.0, False
    for cycle in range(200):
        dm_new, diis, e_tot = step(dm, diis)
        de = float(e_tot) - e_old
        dnorm = float(jnp.linalg.norm(dm_new - dm))
        dm, e_old = dm_new, float(e_tot)
        if abs(de) < 1e-8 and dnorm < 1e-6:  # ref dft.py:243
            converged = True
            break
    assert converged, (cycle, e_old)
    # grid level 0 Decane B3LYP: quadrature-limited window around the
    # level-3 value -389.665 (BASELINE.md)
    assert -390.2 < e_old < -389.2, e_old
def test_sharded_ri_jk_match_single_device():
    """The even-tempered RI branch (explicit fitting metric, all_gather +
    V^+ solve) stays covered now that density_fit=True defaults to the
    Cholesky identity-metric path."""
    from quantum_compute_dft_tpu.integrals.density_fitting import (
        df_tensors,
        make_df_builders,
    )
    from quantum_compute_dft_tpu.parallel.sharded import sharded_df_builders

    mol = from_atoms(H2O)
    s_in = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=False)
    from quantum_compute_dft_tpu.basis import build_basis

    j3c, v2c = df_tensors(build_basis(mol), mol, aux_level="fast")
    dm = initial_guess(s_in.sys)
    jf, kf, _ = make_df_builders(j3c, v2c)
    j_ref, k_ref = jf(dm), kf(dm)
    build_jk = sharded_df_builders(grid_mesh(), j3c, v2c)
    j_sh, k_sh = build_jk(dm)
    # psum/gather reassociation on J entries of magnitude ~19 -> ~2e-11
    # relative roundoff
    assert float(jnp.abs(j_sh - j_ref).max()) < 2e-9
    assert float(jnp.abs(k_sh - k_ref).max()) < 2e-9


@pytest.mark.slow
def test_sharded_scf_step_purification_forced(monkeypatch):
    """The sharded step shares the single-chip TPU numerics recovery:
    with DFT_FORCE_SIGN_DENSITY=1 (purification-forced CPU run) the
    sharded and single-chip iterations still agree (VERDICT item 9)."""
    monkeypatch.setenv("DFT_FORCE_SIGN_DENSITY", "1")
    from quantum_compute_dft_tpu.parallel.sharded_scf import make_sharded_scf
    from quantum_compute_dft_tpu.scf.diis import diis_init
    from quantum_compute_dft_tpu.scf.driver import scf_iteration

    mol = from_atoms(H2O)
    s_df = kohn_sham.prepare(mol, "B3LYP", grid_level=0, density_fit=True)
    mesh = grid_mesh()
    step, dm0, diis0 = make_sharded_scf(mesh, s_df.sys, s_df.functional)
    dm_sh, _, e_sh = step(dm0, diis0)
    dm_1, _, eb = scf_iteration(
        s_df.sys, s_df.functional, dm0, diis_init(dm0.shape[0])
    )
    # first-step energies carry the same ~1e-9 eigensolve amplification as
    # the unforced path (see test above)
    assert abs(float(e_sh) - float(eb.e_tot)) < 5e-9
    assert float(jnp.abs(dm_sh - dm_1).max()) < 1e-7


def test_sharded_requires_eri_or_df():
    from quantum_compute_dft_tpu.parallel.sharded_scf import make_sharded_scf
    from quantum_compute_dft_tpu.scf.driver import make_system

    mol = from_atoms(H2O)
    s_in = kohn_sham.prepare(mol, "LDA", grid_level=0)
    bad = make_system(
        np.asarray(s_in.sys.hcore), np.asarray(s_in.sys.s), None,
        np.asarray(s_in.sys.ao), np.asarray(s_in.sys.weights), None,
        s_in.sys.e_nuc, s_in.sys.nocc,
    )
    with pytest.raises(ValueError, match="in-core ERIs"):
        make_sharded_scf(grid_mesh(), bad, s_in.functional)


def test_lda_sharded_without_gradients(setup):
    mol = from_atoms(H2O)
    s_lda = kohn_sham.prepare(mol, "LDA", grid_level=1)
    mesh = grid_mesh()
    dm = initial_guess(s_lda.sys)
    e_ref, v_ref = xc_step(s_lda.functional, dm, s_lda.sys.ao, s_lda.sys.weights, None)
    ao_s, w_s, _ = shard_grid_arrays(mesh, s_lda.sys.ao, s_lda.sys.weights)
    fn = sharded_xc_step(mesh, s_lda.functional)
    e_sh, v_sh = fn(dm, ao_s, w_s, None)
    assert abs(float(e_sh) - float(e_ref)) < 1e-11
    assert float(jnp.abs(v_sh - v_ref).max()) < 1e-11
