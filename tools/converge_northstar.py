"""Converge the 117-atom north star: full sharded DF-B3LYP SCF on an
8-device mesh, driven to the reference convergence rule
(|dE| < 1e-8 Eh AND ||dD||_F < 1e-6, <= 200 cycles -- ref dft.py:199,243).

This upgrades tools/dryrun_northstar.py from one SPMD step to a recorded
convergence trajectory: the claim that the grid-sharded + aux-sharded
Cholesky-DF Fock build (the configuration the reference's in-core
(nao^2, nao^2) dgemv, ref src/dft_solver.cu:550-555, cannot represent at
nao=377 / ~160 GB) actually *finishes* an SCF, not just executes.

The expensive one-time factorization is read from the disk artifact
produced on the TPU by tools/northstar_cache.py; everything else
(one-electron matrices, grid, AO values, the SPMD step itself) is built
here on the CPU mesh.

Run (CPU, 8 virtual devices):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/converge_northstar.py
Appends one JSON line per cycle to docs/northstar_trajectory.jsonl and
writes the final summary to docs/northstar_convergence.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS at interpreter start (see tests/conftest.py) -- this is a
# CPU-mesh SPMD tool, so override it back before a backend initializes
jax.config.update("jax_platforms", "cpu")

import numpy as np

E_TOL, D_TOL = 1e-8, 1e-6  # ref dft.py:243
MAX_CYCLES = 200           # ref dft.py:199


def main() -> int:
    t0 = time.time()
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.parallel.mesh import grid_mesh
    from quantum_compute_dft_tpu.parallel.sharded_scf import make_sharded_scf

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol_name = os.environ.get("NORTHSTAR_MOL", "C33H56N7O17P3S")
    cd_tol = float(os.environ.get("NORTHSTAR_CD_TOL", "1e-4"))
    grid_level = int(os.environ.get("NORTHSTAR_GRID_LEVEL", "0"))
    max_hours = float(os.environ.get("NORTHSTAR_MAX_HOURS", "8"))
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
    step, dm, diis = make_sharded_scf(mesh, setup.sys, setup.functional)
    print(f"setup done in {time.time()-t0:.0f}s: nao={setup.nao}, "
          f"ngrid={setup.ngrid}, rank={setup.sys.df_j3c.shape[2]}, "
          f"mesh={n_dev} devices", flush=True)

    # grade-aware outputs: an L1/tighter-CD run must not clobber the
    # recorded L0 artifacts
    suffix = "" if grid_level == 0 else f"_L{grid_level}"
    traj_path = os.path.join(here, "docs",
                             f"northstar_trajectory{suffix}.jsonl")
    out_path = os.path.join(here, "docs",
                            f"northstar_convergence{suffix}.json")

    e_last = None
    dm_last = np.asarray(dm)
    converged = False
    cycle = 0
    start_cycle = 1
    ckpt_path = os.path.join(here, ".cache",
                             f"northstar_dm_{mol_name}{suffix}.npz")
    if os.path.exists(ckpt_path) and not os.environ.get("NORTHSTAR_FRESH"):
        with np.load(ckpt_path) as z:
            dm = jax.device_put(z["dm"])
            dm_last = z["dm_last"]
            e_last = float(z["e_last"]) if np.isfinite(z["e_last"]) else None
            start_cycle = int(z["cycle"]) + 1
        print(f"resumed from checkpoint at cycle {start_cycle - 1}", flush=True)
    else:
        open(traj_path, "w").close()
    deadline = t0 + max_hours * 3600
    for cycle in range(start_cycle, MAX_CYCLES + 1):
        t_c = time.time()
        dm, diis, e_tot = step(dm, diis)
        jax.block_until_ready(dm)
        e = float(e_tot)
        dm_np = np.asarray(dm)
        d_norm = float(np.linalg.norm(dm_np - dm_last))
        de = abs(e - e_last) if e_last is not None else float("nan")
        row = {"cycle": cycle, "e_tot": e, "dE": de, "dD": d_norm,
               "t_s": round(time.time() - t_c, 1)}
        with open(traj_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(row, flush=True)
        if not np.isfinite(e):
            break
        if e_last is not None and de < E_TOL and d_norm < D_TOL:
            converged = True
            break
        e_last, dm_last = e, dm_np
        np.savez(ckpt_path, dm=dm_np, dm_last=dm_last,
                 e_last=e if e is not None else np.nan, cycle=cycle)
        if time.time() > deadline:
            print("walltime budget exhausted", flush=True)
            break

    out = {
        "molecule": mol_name,
        "nao": int(setup.nao),
        "ngrid": int(setup.ngrid),
        "cd_rank": int(setup.sys.df_j3c.shape[2]),
        "cd_tol": cd_tol,
        "grid_level": grid_level,
        "n_devices": n_dev,
        "converged": converged,
        "cycles": cycle,
        "e_tot": float(e_tot),
        "conv_rule": f"|dE|<{E_TOL:g} and ||dD||_F<{D_TOL:g}",
        "total_s": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if converged else 1


if __name__ == "__main__":
    sys.exit(main())
