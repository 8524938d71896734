"""Quantify quadrature (grid) error of the production grid level.

The reference integrates XC on the PySCF Becke level-3 grid
(ref grid.py:33-39); our grids are built natively (grids/builder.py) with
NWChem-style pruning, so their quadrature error must be bounded
independently.  PySCF is not installable in this environment (zero
egress), so instead of diffing against the reference grid directly this
study measures grid-refinement convergence: E(level) - E(level=7,
unpruned), where the level-7 unpruned grid (~4x the points, 99 radial
shells, degree-35+ Lebedev) is converged far below 1e-7 Eh.

Run: JAX_PLATFORMS=cpu python tools/grid_error_study.py [molecule ...]
Writes a markdown table to stdout; referenced from BASELINE.md.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from quantum_compute_dft_tpu import kohn_sham
from quantum_compute_dft_tpu.grids import build_grid
from quantum_compute_dft_tpu.mol import from_xyz_file
from quantum_compute_dft_tpu.scf.driver import scf_host


def study(mol_path: str, functional: str = "LDA", ref_level: int = 7):
    mol = from_xyz_file(mol_path)
    rows = []
    # reference: highest level, no pruning
    ref_grid = build_grid(mol, level=ref_level, prune=False)
    setup = kohn_sham.prepare(mol, functional, grid=ref_grid)
    e_ref = scf_host(setup.sys, setup.functional).e_tot
    for level in (1, 2, 3, 4):
        for prune in (True, False):
            g = build_grid(mol, level=level, prune=prune)
            s = kohn_sham.prepare(mol, functional, grid=g)
            r = scf_host(s.sys, s.functional)
            rows.append((level, prune, g.ngrid, r.e_tot - e_ref, r.converged))
    name = mol_path.rsplit("/", 1)[-1].removesuffix(".xyz")
    print(f"\n### {name} {functional}  (ref: level {ref_level} unpruned, "
          f"{ref_grid.ngrid} pts, E = {e_ref:.8f})")
    print("| level | pruned | ngrid | E - E_ref (Eh) | converged |")
    print("|---|---|---|---|---|")
    for level, prune, ngrid, de, conv in rows:
        print(f"| {level} | {prune} | {ngrid} | {de:+.2e} | {conv} |")


if __name__ == "__main__":
    mols = sys.argv[1:] or ["molecules/H2O.xyz"]
    for m in mols:
        for fn in ("LDA", "GGA"):
            study(m, fn)
