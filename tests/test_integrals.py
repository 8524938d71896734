"""Integral engine tests: Boys function, S/T/V, ERI.

Oracles (no PySCF in this environment): scipy's incomplete gamma for Boys;
independent closed-form s-orbital formulas; Szabo-Ostlund literature values
for H2/STO-3G; rotational invariance and permutation symmetry for p shells;
normalization for d shells.  (The reference's only check was an end-of-run
PySCF energy diff, ref dft.py:272-297; this suite is strictly stronger per
SURVEY.md section 4.)
"""

import numpy as np
import pytest
from math import gamma, pi, erf, exp, sqrt

import jax.numpy as jnp
from scipy.special import gammainc as sgammainc

from quantum_compute_dft_tpu.mol import from_atoms, from_xyz_text
from quantum_compute_dft_tpu.basis import build_basis
from quantum_compute_dft_tpu.integrals import boys, one_electron, eri_full

H2 = "H 0 0 0\nH 0 0 0.74084823"  # 1.4 bohr


def _boys_ref(m, x):
    x = np.asarray(x, float)
    out = np.empty_like(x)
    small = x < 1e-14
    out[small] = 1.0 / (2 * m + 1)
    xs = x[~small]
    out[~small] = gamma(m + 0.5) * sgammainc(m + 0.5, xs) / (2 * xs ** (m + 0.5))
    return out


def test_boys_vs_scipy():
    xs = np.concatenate(
        [np.array([0.0, 1e-15, 11.999, 12.0, 12.001]), np.logspace(-6, 6, 80)]
    )
    F = np.array(boys(12, jnp.array(xs)))
    for m in range(13):
        ref = _boys_ref(m, xs)
        rel = np.abs(F[m] - ref) / np.maximum(np.abs(ref), 1e-300)
        assert rel.max() < 1e-12, (m, rel.max())


def test_one_electron_h2_vs_closed_form_and_literature():
    mol = from_xyz_text(H2)
    bas = build_basis(mol)
    S, T, V = one_electron(bas, mol.coords, mol.charges)

    # independent dumb s-only implementation
    def boys0(x):
        return 1.0 if x < 1e-12 else 0.5 * sqrt(pi / x) * erf(sqrt(x))

    al, co, ce = bas.cart_alphas, bas.cart_coeffs, bas.cart_centers
    n = bas.ncart
    S2, T2, V2 = np.zeros((n, n)), np.zeros((n, n)), np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            for a, ca in zip(al[i], co[i]):
                for b, cb in zip(al[j], co[j]):
                    p, mu = a + b, a * b / (a + b)
                    ab2 = ((ce[i] - ce[j]) ** 2).sum()
                    K = exp(-mu * ab2)
                    s = (pi / p) ** 1.5 * K
                    S2[i, j] += ca * cb * s
                    T2[i, j] += ca * cb * mu * (3 - 2 * mu * ab2) * s
                    P = (a * ce[i] + b * ce[j]) / p
                    for C, Z in zip(mol.coords, mol.charges):
                        pc2 = ((P - C) ** 2).sum()
                        V2[i, j] += -Z * ca * cb * (2 * pi / p) * K * boys0(p * pc2)
    assert abs(S - S2).max() < 1e-13
    assert abs(T - T2).max() < 1e-13
    assert abs(V - V2).max() < 1e-13

    # Szabo-Ostlund Table 3.5-style values at R=1.4 bohr, zeta=1.24
    assert abs(S[0, 1] - 0.6593) < 2e-4
    assert abs(T[0, 0] - 0.7600) < 2e-4
    assert abs(T[0, 1] - 0.2365) < 2e-4


def test_eri_h2_literature_values():
    mol = from_xyz_text(H2)
    eri = eri_full(build_basis(mol))
    assert abs(eri[0, 0, 0, 0] - 0.7746) < 2e-4
    assert abs(eri[0, 0, 1, 1] - 0.5697) < 2e-4
    assert abs(eri[0, 1, 0, 1] - 0.2970) < 2e-4
    assert abs(eri[0, 0, 0, 1] - 0.4441) < 2e-4


def _rhf(mol, max_iter=100):
    from scipy.linalg import eigh

    bas = build_basis(mol)
    S, T, V = one_electron(bas, mol.coords, mol.charges)
    eri = eri_full(bas)
    H = T + V
    nocc = mol.nocc
    e, C = eigh(H, S)
    D = 2 * C[:, :nocc] @ C[:, :nocc].T
    E_old = 0.0
    for _ in range(max_iter):
        J = np.einsum("ijkl,kl->ij", eri, D)
        K = np.einsum("ikjl,kl->ij", eri, D)
        F = H + J - 0.5 * K
        e, C = eigh(F, S)
        D = 2 * C[:, :nocc] @ C[:, :nocc].T
        E = np.sum(D * (H + 0.5 * (J - 0.5 * K))) + mol.energy_nuc()
        if abs(E - E_old) < 1e-11:
            break
        E_old = E
    return E


def test_h2_rhf_literature():
    assert abs(_rhf(from_xyz_text(H2)) - (-1.116714)) < 1e-5


def test_h2o_rhf_literature():
    # canonical STO-3G H2O RHF energy at the reference geometry
    h2o = [
        ("O", (0.0, 0.0, 0.127)),
        ("H", (0.0, 0.758, -0.509)),
        ("H", (0.0, -0.758, -0.509)),
    ]
    assert abs(_rhf(from_atoms(h2o)) - (-74.965901)) < 1e-5


def test_atomic_sto3g_literature():
    """Published STO-3G SCF atomic energies (Hehre-Stewart-Pople STO-3G
    papers; single-basis-function closed forms, independent of the SCF
    driver): H = h11, He = 2*h11 + (11|11)."""
    from quantum_compute_dft_tpu.basis import build_basis
    from quantum_compute_dft_tpu.integrals import eri_full

    h = from_atoms([("H", (0.0, 0.0, 0.0))])
    bas = build_basis(h)
    s, t, v = one_electron(bas, h.coords, h.charges)
    assert abs(float(t[0, 0] + v[0, 0]) - (-0.4665819)) < 1e-6

    he = from_atoms([("He", (0.0, 0.0, 0.0))])
    bas = build_basis(he)
    s, t, v = one_electron(bas, he.coords, he.charges)
    eri = eri_full(bas)
    e_he = 2.0 * float(t[0, 0] + v[0, 0]) + float(eri[0, 0, 0, 0])
    assert abs(e_he - (-2.807784)) < 1e-6


def test_rotational_invariance_p_shells():
    h2o = [
        ("O", (0.0, 0.0, 0.127)),
        ("H", (0.0, 0.758, -0.509)),
        ("H", (0.0, -0.758, -0.509)),
    ]
    E1 = _rhf(from_atoms(h2o))
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    rot = [(s, tuple(Q @ np.array(c))) for s, c in h2o]
    E2 = _rhf(from_atoms(rot))
    assert abs(E1 - E2) < 1e-9


def test_eri_permutation_symmetry():
    nh3 = [
        ("N", (0.0, 0.0, 0.1)),
        ("H", (0.0, 0.94, -0.32)),
        ("H", (0.81, -0.47, -0.32)),
        ("H", (-0.81, -0.47, -0.32)),
    ]
    eri = eri_full(build_basis(from_atoms(nh3)))
    assert abs(eri - eri.transpose(1, 0, 2, 3)).max() < 1e-12
    assert abs(eri - eri.transpose(0, 1, 3, 2)).max() < 1e-12
    assert abs(eri - eri.transpose(2, 3, 0, 1)).max() < 1e-12


def test_d_shell_normalization_and_symmetry():
    mol = from_xyz_text("Cu 0 0 0\nO 0 0 1.7", charge=1)
    bas = build_basis(mol)
    S, T, V = one_electron(bas, mol.coords, mol.charges)
    assert abs(np.diag(S) - 1.0).max() < 1e-12
    assert abs(S - S.T).max() < 1e-13
    assert abs(V - V.T).max() < 1e-10


def test_one_electron_chunked_matches_single_dispatch(monkeypatch):
    """The pair-chunked dispatch (HBM-bounded path used by the 117-atom
    north star) must be bit-identical to the single-dispatch path."""
    import importlib

    oe = importlib.import_module(
        "quantum_compute_dft_tpu.integrals.one_electron"
    )
    nh3 = [
        ("N", (0.0, 0.0, 0.1)),
        ("H", (0.0, 0.94, -0.32)),
        ("H", (0.81, -0.47, -0.32)),
        ("H", (-0.81, -0.47, -0.32)),
    ]
    mol = from_atoms(nh3)
    bas = build_basis(mol)
    ref = one_electron(bas, mol.coords, mol.charges)
    # natom=4, nprim=3 -> chunk floor (1024) still above npairs(=36);
    # shrink the floor too so several chunks + tail padding are exercised
    monkeypatch.setattr(oe, "_ROW_BUDGET", 4 * 9 * 10)
    monkeypatch.setattr(
        oe, "_pair_chunk",
        lambda natom, nprim: max(7, oe._ROW_BUDGET // (natom * nprim * nprim)),
    )
    got = oe.one_electron(bas, mol.coords, mol.charges)
    for a, b in zip(ref, got):
        assert np.abs(a - b).max() == 0.0
