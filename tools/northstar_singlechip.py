"""Converge the 117-atom north star on ONE TPU chip.

The reference cannot represent this configuration at all: its in-core
(nao^2, nao^2) ERI operand (ref src/dft_solver.cu:550-555) is ~160 GB at
nao=377.  The CPU-mesh SPMD validation (tools/converge_northstar.py)
proved the sharded program converges; this tool proves the SAME physics
fits and converges on a single v5e chip through the production
single-device path: Cholesky-DF Fock build (aux-major fast J/K passed
as jit arguments), fused Pallas XC, blocked dispatch, 'fast' schedule
with the final f64 energy evaluation.

Run (TPU): python tools/northstar_singlechip.py
Reads the factorization artifact from tools/northstar_cache.py
(.cache/northstar_L_<mol>_tol<tol>.npz); writes
docs/northstar_singlechip.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    t0 = time.time()
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.scf.driver import scf_host_staged

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol_name = os.environ.get("NORTHSTAR_MOL", "C33H56N7O17P3S")
    cd_tol = float(os.environ.get("NORTHSTAR_CD_TOL", "1e-4"))
    grid_level = int(os.environ.get("NORTHSTAR_GRID_LEVEL", "0"))
    xc_impl = os.environ.get("NORTHSTAR_XC_IMPL", "fast")
    # the 117-atom system needs ~40 f32 + O(100) delta cycles; the
    # reference's 200-cap is for its (much smaller) molecule set
    max_cycle = int(os.environ.get("NORTHSTAR_MAX_CYCLE", "400"))
    # all integral/cycle programs are in the persistent compile cache
    # after the first attempt, so a single run IS the warm measurement;
    # set =1 to pay a full second SCF for a same-process warm number
    warm_rerun = os.environ.get("NORTHSTAR_WARM_RERUN", "0") == "1"
    mol = from_xyz_file(os.path.join(here, "molecules", f"{mol_name}.xyz"))

    l_path = os.path.join(here, ".cache",
                          f"northstar_L_{mol_name}_tol{cd_tol:g}.npz")
    if not os.path.exists(l_path):
        print(f"missing {l_path}; run tools/northstar_cache.py first")
        return 1
    l_vec = np.load(l_path)["l_vec"]
    print(f"L loaded: shape {l_vec.shape}", flush=True)

    # Becke grid on the HOST: the partition-weight build materializes an
    # (ngrid_raw x natom x ...) intermediate that XLA fuses into a ~38 GB
    # buffer at 117 atoms -- fine in 125 GB of host RAM, OOM on a 16 GB
    # chip.  Everything downstream (integrals, AO eval, SCF) stays on
    # the TPU.  Cached under the same setup_cache key kohn_sham.prepare
    # uses, so a host-side prebuild (JAX_PLATFORMS=cpu) feeds this run.
    import jax as _jax
    from quantum_compute_dft_tpu import setup_cache
    from quantum_compute_dft_tpu.basis import build_basis
    from quantum_compute_dft_tpu.grids import Grid, build_grid

    gkey = (f"{setup_cache.molecule_basis_key(mol, build_basis(mol))}"
            f"_L{grid_level}_p1")
    hit = setup_cache.load("grid", gkey, ("coords", "weights", "atom_idx"))
    if hit is not None:
        grid = Grid(coords=hit[0], weights=hit[1], atom_idx=hit[2])
        print(f"grid cache hit: {grid.ngrid} points", flush=True)
    else:
        with _jax.default_device(_jax.devices("cpu")[0]):
            g = build_grid(mol, level=grid_level, prune=True)
            grid = Grid(coords=np.asarray(g.coords),
                        weights=np.asarray(g.weights),
                        atom_idx=np.asarray(g.atom_idx))
        setup_cache.store("grid", gkey, coords=grid.coords,
                          weights=grid.weights, atom_idx=grid.atom_idx)
    print(f"grid built on host: {grid.ngrid} points "
          f"({time.time()-t0:.1f}s)", flush=True)
    setup = kohn_sham.prepare(mol, "B3LYP", grid_level=grid_level,
                              grid=grid, _df_override=(l_vec, None),
                              skip_fast_b64=(xc_impl == "mixed"))
    t_setup = time.time() - t0
    print(f"setup {t_setup:.1f}s  nao={setup.nao} ngrid={setup.ngrid} "
          f"rank={l_vec.shape[2]}", flush=True)

    scf_sys = setup.sys
    functional = setup.functional
    nao, ngrid = setup.nao, setup.ngrid
    if xc_impl == "mixed":
        # HBM budget at nao=377/ngrid=289k: the mixed schedule never
        # touches the aux-major f64 factor ('fast'-only smooth J,
        # 1.75 GB) nor the ijq-f32 exchange closure (0.88 GB; cycles use
        # the aux-major k_arg, anchors use df_exchange_hi over the f64
        # factor).  Dropping both (and the original KSSetup holding
        # them) leaves headroom for the f64 anchor programs' multi-GB
        # workspaces.
        import dataclasses

        from quantum_compute_dft_tpu.scf.driver import transfer_packed

        new_sys = dataclasses.replace(scf_sys, df_b64=None,
                                      df_exchange=None)
        # the packed-plane cache is identity-keyed; the lean-AO prepare
        # seeded it for the ORIGINAL system object
        transfer_packed(scf_sys, new_sys)
        scf_sys = new_sys
    setup = None  # release the original SCFSystem's array references

    def cb(cycle, eb, de, dnorm):
        print(f"{cycle + 1:3d} E={float(eb.e_tot):.8f} de={de:.2e} "
              f"dn={dnorm:.2e}", flush=True)

    # mid-run periodic checkpointing (round 5): a crash at cycle 100 of
    # this ~20-minute run resumes from the last atomic save.  Resume by
    # re-running with NORTHSTAR_RESUME=1.
    from quantum_compute_dft_tpu.scf.checkpoint import (
        load_checkpoint,
        periodic_saver,
    )

    ck_path = os.path.join(here, ".cache",
                           f"northstar_ck_{mol_name}_L{grid_level}.npz")
    dm0 = None
    if os.environ.get("NORTHSTAR_RESUME") == "1" and os.path.exists(ck_path):
        ck = load_checkpoint(ck_path)
        dm0 = ck["dm"]
        print(f"resuming from checkpoint cycle {ck['cycle']} "
              f"(E={ck['e_tot']:.8f})", flush=True)

    t1 = time.time()
    r = scf_host_staged(scf_sys, functional, xc_impl=xc_impl,
                        callback=cb, max_cycle=max_cycle, dm0=dm0,
                        checkpoint_cb=periodic_saver(
                            ck_path, functional.name, mol_name),
                        checkpoint_every=25)
    t_scf = time.time() - t1
    out = {
        "molecule": mol_name,
        "nao": nao,
        "ngrid": ngrid,
        "cd_tol": cd_tol,
        "cd_rank": int(l_vec.shape[2]),
        "grid_level": grid_level,
        "xc_impl": xc_impl,
        "max_cycle": max_cycle,
        "converged": bool(r.converged),
        "n_iter": int(r.n_iter),
        "e_tot": float(r.e_tot),
        "scf_s": round(t_scf, 2),
        "setup_s": round(t_setup, 2),
        "device": "TPU v5e single chip",
        "mesh_reference_e": -4233.51589899,  # docs/northstar_convergence.json
    }
    if warm_rerun:
        t2 = time.time()
        r2 = scf_host_staged(scf_sys, functional, xc_impl=xc_impl,
                             max_cycle=max_cycle)
        out["scf_s_warm"] = round(time.time() - t2, 2)
        out["e_tot_warm"] = float(r2.e_tot)
        out["converged_warm"] = bool(r2.converged)
    suffix = "" if grid_level == 0 else f"_L{grid_level}"
    path = os.path.join(here, "docs", f"northstar_singlechip{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return 0 if r.converged else 2


if __name__ == "__main__":
    sys.exit(main())
