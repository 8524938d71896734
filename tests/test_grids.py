"""Grid tests: quadrature exactness, Becke partition, file loader, AO eval."""

import numpy as np

from quantum_compute_dft_tpu.basis import build_basis
from quantum_compute_dft_tpu.engine.ao_eval import eval_ao
from quantum_compute_dft_tpu.grids import build_grid, load_grid_file
from quantum_compute_dft_tpu.grids.angular import lebedev
from quantum_compute_dft_tpu.grids.radial import treutler_ahlrichs
from quantum_compute_dft_tpu.integrals import one_electron
from quantum_compute_dft_tpu.mol import from_atoms

H2O = [
    ("O", (0.0, 0.0, 0.127)),
    ("H", (0.0, 0.758, -0.509)),
    ("H", (0.0, -0.758, -0.509)),
]


def test_radial_integrates_exponential():
    # int_0^inf exp(-r) r^2 dr = 2; the TA/Chebyshev rule converges ~n^-3
    r, w = treutler_ahlrichs(60, "O")
    assert abs(np.sum(w * np.exp(-r)) - 2.0) < 1e-5
    r, w = treutler_ahlrichs(150, "O")
    assert abs(np.sum(w * np.exp(-r)) - 2.0) < 3e-7


def test_lebedev_integrates_harmonics():
    pts, w = lebedev(29)
    assert abs(w.sum() - 4 * np.pi) < 1e-10
    # odd harmonics integrate to zero, x^2 integrates to 4 pi / 3
    assert abs(np.sum(w * pts[:, 0])) < 1e-12
    assert abs(np.sum(w * pts[:, 0] ** 2) - 4 * np.pi / 3) < 1e-10


def test_grid_integrates_density_to_nelec():
    # the quadrature must integrate rho to the electron count
    mol = from_atoms(H2O)
    bas = build_basis(mol)
    grid = build_grid(mol, level=3)
    ao = eval_ao(bas, grid.coords)
    s_num = (ao * grid.weights[:, None]).T @ ao
    s, t, v = one_electron(bas, mol.coords, mol.charges)
    assert abs(s_num - s).max() < 5e-6  # quadrature-limited


def test_grid_level_convergence():
    mol = from_atoms(H2O)
    bas = build_basis(mol)
    s, _, _ = one_electron(bas, mol.coords, mol.charges)
    errs = []
    for level in (1, 3):
        grid = build_grid(mol, level=level)
        ao = eval_ao(bas, grid.coords)
        s_num = (ao * grid.weights[:, None]).T @ ao
        errs.append(abs(s_num - s).max())
    assert errs[1] < errs[0]


def test_becke_partition_of_unity():
    # sum over owning atoms of the Becke weight at any point is exactly 1
    import jax.numpy as jnp
    from quantum_compute_dft_tpu.grids.becke import becke_weights

    mol = from_atoms(H2O)
    rng = np.random.default_rng(3)
    pts = rng.normal(scale=1.5, size=(50, 3))
    total = np.zeros(50)
    for ia in range(mol.natm):
        total += np.asarray(
            becke_weights(
                jnp.asarray(pts),
                jnp.asarray(mol.coords),
                jnp.full(50, ia, dtype=int),
                jnp.asarray(mol.bragg_radii()),
            )
        )
    assert abs(total - 1.0).max() < 1e-12


def test_grid_file_loader(tmp_path):
    # the reference 6-column format: atom_idx x y z w w (ref grid.py:11-15)
    p = tmp_path / "g.txt"
    np.savetxt(p, np.array([[0, 0.0, 0.0, 0.1, 0.5, 0.5],
                            [1, 0.0, 0.2, 0.0, 0.25, 0.25]]))
    g = load_grid_file(str(p))
    assert g.ngrid == 2
    assert np.allclose(g.weights, [0.5, 0.25])
    assert g.atom_idx.tolist() == [0, 1]


def test_ao_gradients_finite_difference():
    mol = from_atoms(H2O)
    bas = build_basis(mol)
    pts = np.array([[0.1, -0.2, 0.3], [1.0, 0.5, -0.7]])
    ao, grad = eval_ao(bas, pts, deriv=1)
    eps = 1e-6
    for k in range(3):
        p1, p2 = pts.copy(), pts.copy()
        p1[:, k] += eps
        p2[:, k] -= eps
        fd = (eval_ao(bas, p1) - eval_ao(bas, p2)) / (2 * eps)
        assert abs(fd - grad[k]).max() < 1e-6
