"""Mesh-vs-single-device parity at the PRODUCTION north-star grade.

VERDICT r3 missing #3: the 8-device sharded 117-atom run had converged
only at dryrun grade (grid 0 / CD 1e-4); the production config
(grid 1 / CD 1e-5) had converged single-chip only.  This tool closes the
gap the cheap way the verdict sanctioned: run the SAME production-grade
SCF cycles (grid level 1, Cholesky tol 1e-5, rank ~2150) on the
8-device mesh AND on one device from the same initial density, and
assert CYCLE-FOR-CYCLE agreement -- the sharded program IS the
single-device math, so the recorded single-chip L1 convergence
(docs/northstar_singlechip_L1.json) transfers to the mesh.

Per cycle it checks |dE| <= 1e-8 and max|dD| <= 1e-7 between the mesh
step (parallel/sharded_scf.make_sharded_scf: grid-sharded XC,
aux-sharded DF J/K, psum-combined) and scf.driver.scf_iteration.

Inputs: the L tensor from tools/northstar_cache.py at tol 1e-5
(built on the TPU; the 1-core host would take hours).

Run (CPU, 8 virtual devices):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      NORTHSTAR_CD_TOL=1e-5 NORTHSTAR_GRID_LEVEL=1 \
      python tools/northstar_mesh_parity.py
Writes docs/northstar_mesh_L1_parity.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    t0 = time.time()
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.parallel.mesh import grid_mesh
    from quantum_compute_dft_tpu.parallel.sharded_scf import make_sharded_scf
    from quantum_compute_dft_tpu.scf.diis import diis_init
    from quantum_compute_dft_tpu.scf.driver import scf_iteration

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol_name = os.environ.get("NORTHSTAR_MOL", "C33H56N7O17P3S")
    cd_tol = float(os.environ.get("NORTHSTAR_CD_TOL", "1e-5"))
    grid_level = int(os.environ.get("NORTHSTAR_GRID_LEVEL", "1"))
    n_cycles = int(os.environ.get("NORTHSTAR_PARITY_CYCLES", "5"))
    mol = from_xyz_file(os.path.join(here, "molecules", f"{mol_name}.xyz"))

    l_path = os.path.join(here, ".cache",
                          f"northstar_L_{mol_name}_tol{cd_tol:g}.npz")
    with np.load(l_path) as z:
        l_vec = z["l_vec"]
    print(f"loaded Cholesky vectors {l_vec.shape} from {l_path}", flush=True)

    setup = kohn_sham.prepare(
        mol, "B3LYP", grid_level=grid_level, density_fit=False,
        _df_override=(l_vec, None),
    )
    del l_vec
    n_dev = len(jax.devices())
    mesh = grid_mesh(n_dev)
    step, dm_m, diis_m = make_sharded_scf(mesh, setup.sys, setup.functional)
    print(f"setup done in {time.time()-t0:.0f}s: nao={setup.nao}, "
          f"ngrid={setup.ngrid}, rank={setup.sys.df_j3c.shape[2]}, "
          f"mesh={n_dev} devices", flush=True)

    dm_s = jax.numpy.asarray(np.asarray(dm_m))
    diis_s = diis_init(setup.nao)
    rows = []
    ok = True
    path = os.path.join(here, "docs", "northstar_mesh_L1_parity.json")

    def _write(done: bool):
        with open(path, "w") as f:
            json.dump({
                "molecule": mol_name,
                "nao": int(setup.nao),
                "ngrid": int(setup.ngrid),
                "cd_rank": int(setup.sys.df_j3c.shape[2]),
                "cd_tol": cd_tol,
                "grid_level": grid_level,
                "n_devices": n_dev,
                "cycles_checked": len(rows),
                "cycles_planned": n_cycles,
                "complete": done,
                "parity_ok": bool(ok),
                "rule": "per-cycle |dE|<=1e-8 and max|dD|<=1e-7",
                "rows": rows,
                "total_s": round(time.time() - t0, 1),
            }, f, indent=1)

    for cycle in range(1, n_cycles + 1):
        t_c = time.time()
        dm_m, diis_m, e_m = step(dm_m, diis_m)
        jax.block_until_ready(dm_m)
        t_mesh = time.time() - t_c
        t_c = time.time()
        dm_s, diis_s, eb_s = scf_iteration(setup.sys, setup.functional,
                                           dm_s, diis_s)
        jax.block_until_ready(dm_s)
        t_one = time.time() - t_c
        de = abs(float(e_m) - float(eb_s.e_tot))
        ddm = float(np.abs(np.asarray(dm_m) - np.asarray(dm_s)).max())
        row = {"cycle": cycle, "e_mesh": float(e_m),
               "e_single": float(eb_s.e_tot), "dE": de, "max_dD": ddm,
               "t_mesh_s": round(t_mesh, 1), "t_single_s": round(t_one, 1)}
        rows.append(row)
        print(row, flush=True)
        ok = ok and de <= 1e-8 and ddm <= 1e-7
        # keep the two trajectories independent (no re-sync): agreement
        # must hold as the states evolve, not just at the first step.
        # Incremental write: each production-grade cycle pair costs ~30
        # minutes on this 1-core host -- never lose completed rows.
        _write(cycle == n_cycles)

    print(json.dumps({"parity_ok": bool(ok), "cycles_checked": len(rows),
                      "total_s": round(time.time() - t0, 1)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
