"""Converge the reference's ENTIRE 58-molecule set end-to-end.

The reference's headline capability is `python dft.py B3LYP <Mol>` over
the 58 geometries in its atom_txt/ (ref dft.py:101-116); it publishes no
numbers and crashes on every odd-electron system.  This tool drives the
same set through this framework's production path (TPU when present:
kohn_sham.prepare + scf_host_staged 'fast' schedule, auto density
fitting above nao 64) and records one row per (molecule, functional):
energy, cycles, SCF and setup wall-clock, basis provenance.

Odd-electron / near-degenerate systems that stall with integer
occupations fall back to the FON-RKS annealing ladder (kT 0.5 -> 0.2),
which the reference cannot represent at all.

Resumable: merges into the output JSON after every molecule.

Run (TPU):  python tools/run_all_molecules.py [out.json] [MOL ...]
Env: SWEEP_FUNCTIONALS=B3LYP[,GGA,...], SWEEP_GRID_LEVEL=3,
     SWEEP_MAX_ATOMS=60 (skip bigger; the 117-atom north star has its
     own dedicated runs -- docs/northstar_*.json), SWEEP_XC_IMPL=fast,
     SWEEP_RESCUE=1 (skip the staged attempt, go straight to the anneal
     ladder -- for rerunning molecules the staged runner already failed).
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(HERE, "docs", "results_58.json")


def run_one(name: str, functional: str, grid_level: int, xc_impl: str,
            rescue: bool = False) -> dict:
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.basis.data import provenance
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.scf.driver import (
        scf_host_annealed,
        scf_host_staged,
    )

    mol = from_xyz_file(os.path.join(HERE, "molecules", name + ".xyz"))
    prov = sorted({provenance(s) for s in mol.symbols})
    t0 = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        setup = kohn_sham.prepare(mol, functional, grid_level=grid_level)
    setup_s = time.time() - t0

    # shape bucketing (SWEEP_BUCKET=0 disables): in-core molecules are
    # zero-padded onto a handful of bucket shapes so the jitted cycle
    # programs are COMPILED ONCE PER BUCKET and reused across molecules
    # (round-3 cold sweep paid 20-60 s of remote compiles per molecule;
    # scf/bucketing.py).  Energies are exact -- padded grid rows carry
    # zero weight and padded orbitals are never occupied.
    run_sys = setup.sys
    if os.environ.get("SWEEP_BUCKET", "1") != "0":
        from quantum_compute_dft_tpu.scf.bucketing import bucketize_system

        run_sys, _ = bucketize_system(setup.sys)

    t0 = time.time()
    smear = 0.0
    impl_used = xc_impl
    if rescue:
        # SWEEP_RESCUE=1: rerun of a molecule the staged runner already
        # burned 200 cycles on without converging -- skip straight to
        # the anneal ladder instead of repeating the doomed attempt.
        r = None
    else:
        r = scf_host_staged(run_sys, setup.functional, xc_impl=xc_impl)
    if r is None or not r.converged:
        # integer occupations have no reachable fixed point for some
        # open-shell / near-degenerate systems (CuO); anneal instead.
        # The ladder runs on the plain per-cycle host loop with the
        # ADIIS->CDIIS mixer: the staged runner's CDIIS+shift stack
        # charge-sloshes on exactly the near-degenerate systems the
        # ladder exists for (measured CuO/L3: staged kT=0.5 stalls at
        # 200 cycles where host/ADIIS converges in 61), and per-cycle
        # dispatch overhead is irrelevant for a rescue path.
        r2 = scf_host_annealed(
            run_sys, setup.functional, mixer="adiis+cdiis",
        )
        if r2 is not None and (r is None or r2.converged):
            r, smear, impl_used = r2, r2.smear_kt, "f64"
    scf_s = time.time() - t0

    return {
        "molecule": name,
        "functional": functional,
        "natom": len(mol.symbols),
        "nao": setup.nao,
        "ngrid": setup.ngrid,
        "density_fit": setup.sys.df_j3c is not None,
        "grid_level": grid_level,
        "xc_impl": impl_used,
        "e_tot": float(r.e_tot),
        "converged": bool(r.converged),
        "n_iter": int(r.n_iter),
        "smear_kt": smear,
        "scf_s": round(scf_s, 2),
        "setup_s": round(setup_s, 1),
        "basis_provenance": prov,
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    functionals = os.environ.get("SWEEP_FUNCTIONALS", "B3LYP").split(",")
    grid_level = int(os.environ.get("SWEEP_GRID_LEVEL", "3"))
    xc_impl = os.environ.get("SWEEP_XC_IMPL", "fast")
    max_atoms = int(os.environ.get("SWEEP_MAX_ATOMS", "60"))

    names = sys.argv[2:]
    if not names:
        sized = []
        for f in sorted(os.listdir(os.path.join(HERE, "molecules"))):
            if not f.endswith(".xyz"):
                continue
            with open(os.path.join(HERE, "molecules", f)) as fh:
                natom = int(fh.readline().split()[0])
            sized.append((natom, f[:-4]))
        names = [n for sz, n in sorted(sized) if sz <= max_atoms]

    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    # SWEEP_WARM=1: second pass -- rerun converged rows in the now-warm
    # process/compile-cache state and record the honest scf_s_warm (the
    # first pass's scf_s includes first-shape remote compiles).
    warm_pass = os.environ.get("SWEEP_WARM") == "1"

    for name in names:
        for fn in functionals:
            key = f"{name}/{fn}"
            prev = results.get(key)
            if prev is not None and "error" not in prev and prev.get("converged"):
                if not (warm_pass and "scf_s_warm" not in prev):
                    print(f"{key}: cached, skipping", flush=True)
                    continue
            t0 = time.time()
            try:
                row = run_one(name, fn, grid_level, xc_impl,
                              rescue=os.environ.get("SWEEP_RESCUE") == "1")
                if warm_pass and prev is not None and prev.get("converged"):
                    prev["scf_s_warm"] = row["scf_s"]
                    prev["setup_s_warm"] = row["setup_s"]
                    prev["e_tot_warm"] = row["e_tot"]
                    row = prev
                results[key] = row
                print(
                    f"{key}: E={row['e_tot']:.8f} conv={row['converged']} "
                    f"({row['n_iter']} cyc, scf {row['scf_s']}s, "
                    f"setup {row['setup_s']}s"
                    + (f", warm scf {row['scf_s_warm']}s"
                       if "scf_s_warm" in row else "")
                    + ")",
                    flush=True,
                )
            except Exception as exc:  # resumable: record and continue
                if prev is None:  # never clobber a real (even unconverged) row
                    results[key] = {"error": repr(exc), "molecule": name,
                                    "functional": fn}
                print(f"{key}: FAILED {exc!r} ({time.time()-t0:.0f}s)",
                      flush=True)
            tmp = out_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)
            os.replace(tmp, out_path)
            # the jitted cycle programs hold each molecule's SCFSystem
            # (a static arg) STRONGLY, so its device arrays (ERIs, AO
            # planes, DF factors) outlive run_one -- ~40 molecules in,
            # the accumulated buffers exhaust the 16 GB HBM.  Drop all
            # jit caches between molecules (the persistent XLA compile
            # cache on disk is unaffected).
            import gc

            import jax

            jax.clear_caches()
            gc.collect()

    n_ok = sum(1 for v in results.values() if v.get("converged"))
    print(f"done: {n_ok}/{len(results)} converged -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
