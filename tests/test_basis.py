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


def test_odd_electron_raises():
    mol = from_xyz_text("H 0 0 0\nO 0 0 0.97")
    with pytest.raises(ValueError):
        mol.nocc


def test_stong_fit_reproduces_canonical():
    from quantum_compute_dft_tpu.basis.stong_fit import fit_shell

    alphas, coeff_sets, _ = fit_shell([(1, 0)], (2.0, 0.4, 0.1))
    assert np.allclose(alphas, UNIVERSAL_FITS["1s"][0], rtol=2e-5)
    assert np.allclose(coeff_sets[0], UNIVERSAL_FITS["1s"][1][0], atol=2e-6)
