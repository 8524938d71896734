"""Basis-layer tests: STO-3G tables, fit generator, molecule handling."""

import numpy as np
import pytest

from quantum_compute_dft_tpu.basis import build_basis, element_shells
from quantum_compute_dft_tpu.basis.data import UNIVERSAL_FITS, ZETA, shells_for_z
from quantum_compute_dft_tpu.mol import from_atoms, from_xyz_text, parse_xyz_text


def test_canonical_h_exponents():
    # H 1s: canonical STO-3G exponents 3.42525091 / 0.62391373 / 0.16885540
    (name, l, alphas, coeffs), = element_shells("H")
    assert np.allclose(alphas, [3.42525091, 0.62391373, 0.16885540], atol=2e-6)
    assert np.allclose(coeffs, [0.15432897, 0.53532814, 0.44463454], atol=1e-7)


def test_canonical_o_2sp():
    shells = element_shells("O")
    sp_s = [s for s in shells if s[0] == "2sp" and s[1] == 0][0]
    assert np.allclose(sp_s[2], [5.0331513, 1.1695961, 0.3803890], atol=2e-5)


def test_na_3sp_canonical():
    shells = element_shells("Na")
    sp = [s for s in shells if s[0] == "3sp"][0]
    assert np.allclose(sp[2], [1.4787406, 0.4125649, 0.1614751], atol=2e-6)


def test_mg_canonical_rows():
    # published Mg STO-3G: 1s 299.2374/54.5065/14.7516, 2sp 15.1218/...,
    # 3sp 1.3954/0.3893/0.1524 (zeta 11.59 / 3.90 / 1.70)
    shells = element_shells("Mg")
    one_s = [s for s in shells if s[0] == "1s"][0]
    assert np.allclose(one_s[2], [299.2374, 54.5065, 14.7516], rtol=1e-4)
    sp2 = [s for s in shells if s[0] == "2sp"][0]
    assert np.allclose(sp2[2], [15.12182, 3.513987, 1.142857], rtol=1e-4)
    sp3 = [s for s in shells if s[0] == "3sp"][0]
    assert np.allclose(sp3[2], [1.395448, 0.389327, 0.152380], rtol=1e-4)


def test_k_ca_canonical_rows():
    # published K/Ca STO-3G exponent triplets (single-zeta scalings of the
    # universal fits; K 1s 771.5104 = 2.2276606*18.61^2 etc.)
    k = element_shells("K")
    assert np.allclose([s for s in k if s[0] == "1s"][0][2],
                       [771.5104, 140.5316, 38.03333], rtol=1e-4)
    assert np.allclose([s for s in k if s[0] == "4sp"][0][2],
                       [0.5039822, 0.1860011, 0.0821401], rtol=1e-4)
    ca = element_shells("Ca")
    assert np.allclose([s for s in ca if s[0] == "1s"][0][2],
                       [854.0325, 155.5631, 42.10144], rtol=1e-4)
    assert np.allclose([s for s in ca if s[0] == "4sp"][0][2],
                       [0.4558490, 0.1682369, 0.0742952], rtol=1e-4)


def test_provenance_tiers_and_warning():
    import warnings

    from quantum_compute_dft_tpu.basis.data import provenance

    # all of periods 1-3 + K/Ca are canonical now
    for sym in ["H", "He", "C", "N", "O", "F", "Na", "Mg", "Al", "Si", "P",
                "S", "Cl", "Ar", "K", "Ca"]:
        assert provenance(sym) == "canonical", sym
    # the six heavy reference elements carry variationally optimized
    # zetas (basis/zeta_optimized.py, VERDICT r2 item 2): derived by the
    # published procedure, still distinct from 'canonical'
    for sym in ["Cu", "As", "Se", "Br", "Mo", "I"]:
        assert provenance(sym) == "optimized", sym
    # elements outside the molecule set keep the pre-optimizer tiers
    # until their background runs land
    for sym in ["Sc", "Ga"]:
        assert provenance(sym) in ("optimized", "atomic", "estimated"), sym
    # pin the optimized Br 1s exponent triplet (universal fit x zeta^2,
    # zeta from the variational run) and Cu's convention-held 4sp
    br = {s[0]: s for s in element_shells("Br")}
    z2 = 34.35417990166987 ** 2
    assert np.allclose(
        br["1s"][2], [a * z2 for a in (2.227660584, 0.405771156, 0.109818)],
        rtol=1e-10,
    )
    from quantum_compute_dft_tpu.basis.zeta_optimized import OPTIMIZED

    assert OPTIMIZED["Cu"]["4sp"] == 1.2  # molecular-convention factor

    # canonical molecules build silently ...
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build_basis(from_xyz_text("Ca 0 0 0\nO 0 0 2.2"))
    # ... non-canonical ones warn
    with pytest.warns(RuntimeWarning, match="STO-3G tables for element Br"):
        build_basis(from_xyz_text("Br 0 0 0\nH 0 0 1.41"))


def test_all_reference_elements_covered():
    # every element in the reference molecule set must have tables
    for sym in ["H", "He", "C", "N", "O", "F", "Na", "Si", "P", "S", "Cl",
                "Ca", "Cu", "As", "Se", "Br", "Mo", "I"]:
        shells = element_shells(sym)
        assert shells, sym
        for _, _, alphas, coeffs in shells:
            assert all(a > 0 for a in alphas)


def test_nao_counts():
    # H2O: O(1s+2s+3x2p)=5 + 2xH(1s) -> 7;  benzene: 6*5 + 6*1 = 36
    h2o = from_xyz_text("O 0 0 0\nH 0 0 0.96\nH 0.93 0 -0.26")
    assert build_basis(h2o).nao == 7
    # iodine: 1s+2sp(4)+3sp(4)+3d(5)+4sp(4)+4d(5)+5sp(4) = 27
    hi = from_xyz_text("I 0 0 0\nH 0 0 1.6")
    assert build_basis(hi).nao == 28


def test_xyz_parser_header_and_bare():
    a = parse_xyz_text("2\ncomment\nH 0 0 0\nH 0 0 0.7")
    b = parse_xyz_text("H 0 0 0\nH 0 0 0.7")
    assert a == b
    assert a[0][0] == "H"


def test_molecule_counts_and_enuc():
    mol = from_xyz_text("O 0 0 0\nH 0 0 0.96\nH 0.93 0 -0.26")
    assert mol.nelec == 10
    assert mol.nocc == 5
    assert mol.energy_nuc() > 0


def test_odd_electron_fractional_occupation():
    # odd electron counts run as fractional-occupation RKS (one singly-
    # occupied HOMO); the reference crashes on these (its PySCF build
    # hardcodes spin=0, ref grid.py:45)
    mol = from_xyz_text("H 0 0 0\nO 0 0 0.97")
    assert mol.nelec == 9
    assert mol.nocc == 4
    assert mol.nopen == 1


def test_stong_fit_reproduces_canonical():
    from quantum_compute_dft_tpu.basis.stong_fit import fit_shell

    alphas, coeff_sets, _ = fit_shell([(1, 0)], (2.0, 0.4, 0.1))
    assert np.allclose(alphas, UNIVERSAL_FITS["1s"][0], rtol=2e-5)
    assert np.allclose(coeff_sets[0], UNIVERSAL_FITS["1s"][1][0], atol=2e-6)
