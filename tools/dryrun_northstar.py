"""North-star dryrun: one sharded DF-B3LYP SCF step at the full
C33H56N7O17P3S (117-atom, nao=377) problem shape.

The reference cannot touch this system: its in-core (nao^2, nao^2) ERI
operand (ref src/dft_solver.cu:550-555) would need ~160 GB on one GPU.
Here the Fock build runs from pivoted-Cholesky ERI vectors sharded over
the aux axis of an 8-device mesh, the XC grid axis is sharded, and all
contributions meet in psums (parallel/sharded_scf.py).

This is a SHAPE/SPMD validation, not a converged calculation: grid level
0 and a loosened Cholesky tolerance keep the one-time factorization
tractable on the CI host; the sharded program and its collectives are
exactly the production ones.

Run (CPU, 8 virtual devices):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/dryrun_northstar.py
Writes one JSON line with the step energy and timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> int:
    t0 = time.time()
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.parallel.mesh import grid_mesh
    from quantum_compute_dft_tpu.parallel.sharded_scf import make_sharded_scf

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol = from_xyz_file(os.path.join(here, "molecules", "C33H56N7O17P3S.xyz"))

    cd_tol = float(os.environ.get("NORTHSTAR_CD_TOL", "1e-4"))
    grid_level = int(os.environ.get("NORTHSTAR_GRID_LEVEL", "0"))
    n_dev = len(jax.devices())

    # prepare with the production DF path but a dryrun-grade tolerance
    from quantum_compute_dft_tpu.basis import build_basis
    from quantum_compute_dft_tpu.integrals.cholesky import cholesky_eri_vectors

    bas = build_basis(mol)
    t_cd = time.time()
    l_vec = cholesky_eri_vectors(bas, tol=cd_tol, verbose=True)
    t_cd = time.time() - t_cd
    print(f"cholesky: nao={bas.nao}, rank={l_vec.shape[2]}, {t_cd:.0f}s",
          flush=True)

    setup = kohn_sham.prepare(
        mol, "B3LYP", grid_level=grid_level, density_fit=False,
        _df_override=(l_vec, None),
    )

    mesh = grid_mesh(n_dev)
    t_build = time.time()
    step, dm, diis = make_sharded_scf(mesh, setup.sys, setup.functional)
    dm, diis, e_tot = step(dm, diis)
    jax.block_until_ready(dm)
    t_step1 = time.time() - t_build
    t_step2 = time.time()
    dm, diis, e_tot = step(dm, diis)
    jax.block_until_ready(dm)
    t_step2 = time.time() - t_step2
    e = float(e_tot)
    assert np.isfinite(e), e

    out = {
        "molecule": "C33H56N7O17P3S",
        "nao": int(setup.nao),
        "ngrid": int(setup.ngrid),
        "cd_rank": int(l_vec.shape[2]),
        "cd_tol": cd_tol,
        "n_devices": n_dev,
        "e_step2": e,
        "cd_s": round(t_cd, 1),
        "step1_s(compile)": round(t_step1, 1),
        "step2_s": round(t_step2, 2),
        "total_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
