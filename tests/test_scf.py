"""SCF driver tests: literature anchors, host/jit agreement, DIIS, CLI."""

import numpy as np
import pytest

from quantum_compute_dft_tpu import kohn_sham
from quantum_compute_dft_tpu.mol import from_atoms, from_xyz_text
from quantum_compute_dft_tpu.scf.driver import (
    scf_host,
    scf_host_staged,
    scf_jit,
)
from quantum_compute_dft_tpu.xc import FUNCTIONALS

H2O = [
    ("O", (0.0, 0.0, 0.127)),
    ("H", (0.0, 0.758, -0.509)),
    ("H", (0.0, -0.758, -0.509)),
]


@pytest.fixture(scope="module")
def h2o_setups():
    mol = from_atoms(H2O)
    return {f: kohn_sham.prepare(mol, f, grid_level=2)
            for f in ("HF", "LDA", "GGA", "B3LYP")}


def test_hf_machinery_hits_literature(h2o_setups):
    # the HF path exercises SCF + DIIS + eigensolver + J + K exactly
    s = h2o_setups["HF"]
    res = scf_host(s.sys, s.functional)
    assert res.converged
    assert abs(res.e_tot - (-74.965901)) < 1e-5


def test_all_functionals_converge(h2o_setups):
    expected_range = {
        "LDA": (-74.80, -74.68),
        "GGA": (-75.30, -75.17),
        "B3LYP": (-75.38, -75.26),
    }
    for name, (lo, hi) in expected_range.items():
        s = h2o_setups[name]
        res = scf_host(s.sys, s.functional)
        assert res.converged, name
        assert lo < res.e_tot < hi, (name, res.e_tot)


def test_jit_loop_matches_host_loop(h2o_setups):
    s = h2o_setups["B3LYP"]
    res = scf_host(s.sys, s.functional)
    dm, eb, n_iter, done = scf_jit(s.sys, s.functional)
    assert bool(done)
    assert abs(float(eb.e_tot) - res.e_tot) < 1e-9


def test_energy_decomposition_sums(h2o_setups):
    s = h2o_setups["B3LYP"]
    res = scf_host(s.sys, s.functional)
    eb = res.energy
    total = (
        float(eb.e_one) + float(eb.e_coul) + float(eb.e_xc)
        + float(eb.e_ex_hf) + s.sys.e_nuc
    )
    assert abs(total - res.e_tot) < 1e-10


@pytest.mark.slow
def test_grid_insensitivity_lda():
    # energies should move < 1e-4 between level 2 and level 3
    mol = from_atoms(H2O)
    e = []
    for level in (2, 3):
        res = kohn_sham.run(mol, "LDA", grid_level=level)
        assert res.converged
        e.append(res.e_tot)
    assert abs(e[0] - e[1]) < 1e-4


def test_charged_molecule():
    # H3O+ : closed shell with charge +1
    h3o = [
        ("O", (0.0, 0.0, 0.0)),
        ("H", (0.0, 0.94, -0.25)),
        ("H", (0.81, -0.47, -0.25)),
        ("H", (-0.81, -0.47, -0.25)),
    ]
    res = kohn_sham.run(from_atoms(h3o, charge=1), "LDA", grid_level=1)
    assert res.converged
    assert -76.0 < res.e_tot < -74.0


def test_zero_cycle_call_returns(h2o_setups):
    # max_cycle=0 must return a well-formed (unconverged) result, not
    # raise on unbound locals
    s = h2o_setups["LDA"]
    for fn in (scf_host, scf_host_staged):
        res = fn(s.sys, s.functional, max_cycle=0)
        assert not res.converged
        assert res.n_iter == 0
        assert np.isnan(res.e_tot)


def test_unconverged_energy_matches_returned_density(h2o_setups):
    # when the loop exits unconverged, the reported energy must be the
    # energy OF the returned density (damping may have mutated it after
    # the last energy evaluation)
    from quantum_compute_dft_tpu.scf.driver import energy_of_dm

    s = h2o_setups["B3LYP"]
    res = scf_host(s.sys, s.functional, max_cycle=3)
    assert not res.converged
    eb = energy_of_dm(s.sys, s.functional, res.dm)
    assert abs(float(eb.e_tot) - res.e_tot) < 1e-12


def test_level_shift_converges_oscillator():
    # HeH/LDA (fractional-occupation doublet) oscillates forever with
    # plain CDIIS: the stall detector must engage the level shift and the
    # SCF must then converge -- the observable VERDICT r2 item 8 asks for
    mol = from_xyz_text(open("molecules/HeH.xyz").read())
    assert mol.nopen == 1  # odd-electron: fractional-occupation RKS
    res = kohn_sham.run(mol, "LDA", grid_level=1)
    assert res.converged
    assert res.shift_engaged_at is not None
    # the controller releases the shift for the DIIS endgame once ||dD||
    # drops below SHIFT_RELEASE, so the FINAL sigma is 0 by design


def test_level_shift_untouched_on_healthy_scf(h2o_setups):
    # healthy convergence must never engage the shift (energies would
    # still be right, but cycle counts would regress)
    s = h2o_setups["LDA"]
    res = scf_host(s.sys, s.functional)
    assert res.converged
    assert res.shift_engaged_at is None
    assert res.level_shift == 0.0


@pytest.mark.slow
def test_fermi_smearing_converges_cuo():
    # CuO/B3LYP: a d-shell doublet whose integer-occupation SCF
    # charge-sloshes forever under every DIIS/level-shift variant;
    # FON-RKS (Fermi smearing, scf.driver._fermi_density) converges it.
    # The reference crashes on CuO outright (spin=0 build, ref grid.py:45).
    import warnings

    from quantum_compute_dft_tpu.mol import from_xyz_file

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        mol = from_xyz_file("molecules/CuO.xyz")
        s = kohn_sham.prepare(mol, "B3LYP", grid_level=2)
    from quantum_compute_dft_tpu.scf.driver import scf_host_annealed

    # two explicit rungs and no integer-finish attempt keep the test
    # time bounded (CuO's integer finish would burn its full cycle
    # budget failing -- that behavior is test_annealed_ladder_recovers_
    # integer_solution's job on a gapped system)
    res = scf_host_annealed(s.sys, s.functional, kts=(0.5, 0.2),
                            finish_integer=False, mixer="adiis+cdiis")
    assert res.converged
    assert res.smear_kt > 0.0
    assert -1700.0 < res.e_tot < -1690.0


def test_annealed_ladder_recovers_integer_solution():
    # a gapped system must come OUT of the ladder with integer
    # occupations (smear_kt == 0) and the same energy as a direct
    # integer-occupation SCF -- the finish_integer warm-start step
    from quantum_compute_dft_tpu.scf.driver import (
        scf_host,
        scf_host_annealed,
    )

    s = kohn_sham.prepare(from_atoms(H2O), "LDA", grid_level=0)
    direct = scf_host(s.sys, s.functional)
    assert direct.converged
    res = scf_host_annealed(s.sys, s.functional, kts=(0.5, 0.2),
                            mixer="adiis+cdiis")
    assert res.converged
    assert res.smear_kt == 0.0
    assert abs(res.e_tot - direct.e_tot) < 1e-7


def test_cli_end_to_end(capsys, tmp_path):
    from quantum_compute_dft_tpu.cli import main

    xyz = tmp_path / "h2.xyz"
    xyz.write_text("2\nH2\nH 0 0 0\nH 0 0 0.74084823\n")
    rc = main(["LDA", str(xyz), "--grid-level", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Converged" in out
    assert "Total energy" in out
    assert "XC(Exc+Vxc)" in out


def test_cli_validate_native(capsys, tmp_path):
    # end-of-run oracle pass (ref dft.py:272-297) through the C++ host
    # engine: the CLI must print the independent energy and a difference
    # within the engines' cross-validation bound
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    from quantum_compute_dft_tpu.cli import main

    xyz = tmp_path / "h2.xyz"
    xyz.write_text("2\nH2\nH 0 0 0\nH 0 0 0.74084823\n")
    rc = main(["LDA", str(xyz), "--grid-level", "1", "--validate", "native"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "native C++ (LDA) energy" in out
    diff = float(out.split("difference")[1].split(":")[1].split("Ha")[0])
    assert diff < 1e-8


def test_cli_unknown_molecule(tmp_path, capsys):
    from quantum_compute_dft_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["LDA", "NoSuchMolecule", "--molecules-dir", str(tmp_path)])


def test_fermi_window_density_matches_eigh_route():
    # the TPU FON density (sign projectors + Chebyshev window matrix
    # function, scf.driver._fermi_density_window) must reproduce the
    # exact raw-eigh smeared density where BOTH are exact (CPU f64),
    # on a DFT-like spectrum: deep cores at -300 Eh, clustered valence
    # around the Fermi level, sparse virtuals
    import numpy as np

    from quantum_compute_dft_tpu.scf import driver

    rng = np.random.default_rng(7)
    n = 80
    w = np.sort(np.concatenate([
        -300.0 - 50.0 * rng.random(8),          # core
        -20.0 - 5.0 * rng.random(8),            # semicore
        -2.0 + 2.5 * rng.random(40),            # valence (dense)
        2.0 + 15.0 * rng.random(24),            # virtuals
    ]))
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    f = (q * w) @ q.T
    f = 0.5 * (f + f.T)
    x = np.eye(n)
    nelec = 90.0  # Fermi level inside the dense valence block
    for kt in (0.5, 0.2, 0.1):
        fp = driver.jnp.asarray(f)
        xj = driver.jnp.asarray(x)
        wj, cpj = driver.jnp.linalg.eigh(fp)
        mu = driver._fermi_mu(wj, nelec, kt)
        occ = driver._fermi_occ(wj, mu, kt)
        occ = occ * (nelec / driver.jnp.sum(occ))
        c = xj @ cpj
        dm_ref = np.asarray((c * occ) @ c.T)
        dm_win = np.asarray(
            driver._fermi_density_window(xj, fp, wj, cpj, mu, nelec, kt)
        )
        err = np.max(np.abs(dm_win - dm_ref))
        assert err < 1e-9, (kt, err)


def test_fermi_window_scf_matches_eigh_scf(monkeypatch):
    # full smeared SCF through the forced window path must land on the
    # same fixed point as the raw-eigh path.  CO2 (nao=15) is the
    # smallest set where the window machinery actually engages (window
    # m=10 < nao; H2O would take the tiny-system eigh fallback)
    import jax

    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.scf.driver import scf_host

    s = kohn_sham.prepare(
        from_xyz_file("molecules/CO2.xyz"), "LDA", grid_level=0
    )
    r_eigh = scf_host(s.sys, s.functional, smear_kt=0.3)
    assert r_eigh.converged
    monkeypatch.setenv("DFT_FON_WINDOW", "force")
    jax.clear_caches()  # the env is read at trace time
    try:
        r_win = scf_host(s.sys, s.functional, smear_kt=0.3)
    finally:
        monkeypatch.undo()
        jax.clear_caches()
    assert r_win.converged
    assert abs(r_win.e_tot - r_eigh.e_tot) < 1e-8


def test_fermi_window_guard_rejects_unresolvable_cut():
    # the window machinery must FALL BACK to the raw-eigh density when
    # no cut gap the sign iteration can resolve exists (relative to the
    # spectral scale): 30 Newton-Schulz doublings sharpen eigenvalues to
    # ~1e-5 of the scale, and an unresolvable cut leaves a projector
    # eigenvalue at McWeeny's unstable 0.5, collapsing the window Gram
    # factor -- observed in the wild as ABAQ/B3LYP at kT=1.0 jumping
    # -857.4 -> -831.5 Eh with ||dD||~80 (driver._fermi_density_window)
    import numpy as np

    from quantum_compute_dft_tpu.scf import driver

    rng = np.random.default_rng(3)
    n = 80
    # scale set by +-100 outliers; everything near the Fermi level is
    # near-degenerate (1e-9 spacings << 3e-5 * scale)
    w = np.sort(np.concatenate([
        np.array([-100.0, 100.0]),
        1e-9 * np.arange(n - 2),
    ]))
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    f = (q * w) @ q.T
    f = 0.5 * (f + f.T)
    fp = driver.jnp.asarray(f)
    xj = driver.jnp.eye(n, dtype=fp.dtype)
    nelec = 90.0
    kt = 0.3
    wj, cpj = driver.jnp.linalg.eigh(fp)
    mu = driver._fermi_mu(wj, nelec, kt)
    occ = driver._fermi_occ(wj, mu, kt)
    occ = occ * (nelec / driver.jnp.sum(occ))
    c = xj @ cpj
    dm_eigh = np.asarray((c * occ) @ c.T)
    dm_win = np.asarray(
        driver._fermi_density_window(xj, fp, wj, cpj, mu, nelec, kt)
    )
    # guard must have selected the eigh fallback exactly
    assert np.array_equal(dm_win, dm_eigh)


def test_staged_runner_adiis_matches_cdiis(h2o_setups):
    # mixer='adiis+cdiis' on the STAGED runner (the only loop that
    # compiles at large-plane shapes over the TPU tunnel; see
    # scf_host_staged) must converge to the CDIIS fixed point.  The
    # ADIIS phase runs per-cycle (no dispatch blocking), hands over to
    # a fresh CDIIS history below ADIIS_TO_CDIIS, and keeps the level
    # shift disabled while active -- same protocol as scf_host's.
    from quantum_compute_dft_tpu.scf.driver import scf_host_staged

    s = h2o_setups["B3LYP"]
    r_c = scf_host_staged(s.sys, s.functional)
    r_a = scf_host_staged(s.sys, s.functional, mixer="adiis+cdiis")
    assert r_c.converged and r_a.converged
    assert abs(r_a.e_tot - r_c.e_tot) < 1e-7
    # smeared FON cycles accept the ADIIS state too
    r_s = scf_host_staged(s.sys, s.functional, mixer="adiis+cdiis",
                          smear_kt=0.2)
    assert r_s.converged


def test_mix_mixer_matches_cdiis_fixed_point(h2o_setups):
    # mixer='mix+cdiis' (damped linear mixing, then CDIIS -- the
    # fallback for maps that DIIS-family extrapolation destabilizes,
    # e.g. ABAQ's compressed-sketch metallic spectrum) must land on the
    # CDIIS fixed point on both loops, including under FON smearing.
    from quantum_compute_dft_tpu.scf.driver import scf_host, scf_host_staged

    s = h2o_setups["B3LYP"]
    r_c = scf_host_staged(s.sys, s.functional)
    r_m = scf_host_staged(s.sys, s.functional, mixer="mix+cdiis",
                          max_cycle=200)
    assert r_c.converged and r_m.converged
    assert abs(r_m.e_tot - r_c.e_tot) < 1e-7
    r_h = scf_host(s.sys, s.functional, mixer="mix+cdiis", max_cycle=200)
    assert r_h.converged and abs(r_h.e_tot - r_c.e_tot) < 1e-7
    r_s = scf_host_staged(s.sys, s.functional, mixer="mix+cdiis",
                          smear_kt=0.3, max_cycle=200)
    assert r_s.converged


def test_density_sanity_guard():
    # _density_sanity must pass a legitimate density through untouched
    # and revert a non-N-representable one (TPU eigh garbage-vector
    # failure mode) to the previous density with a huge residual flag.
    import numpy as np

    from quantum_compute_dft_tpu.scf import driver as d

    s = kohn_sham.prepare(
        __import__("quantum_compute_dft_tpu.mol", fromlist=["from_xyz_file"])
        .from_xyz_file("molecules/H2O.xyz"), "LDA", grid_level=0)
    dm_good = d.initial_guess(s.sys)
    out, bad = d._density_sanity(s.sys, dm_good, dm_good)
    assert float(bad) == 0.0
    assert np.allclose(np.asarray(out), np.asarray(dm_good))
    dm_insane = 50.0 * dm_good  # trace(DS) and norm both blown
    out, bad = d._density_sanity(s.sys, dm_good, dm_insane)
    assert float(bad) == 1e3
    assert np.allclose(np.asarray(out), np.asarray(dm_good))
