"""Rescue the last sweep stragglers with the FON ladder on the STAGED runner.

The host-loop ladder (`scf_host` + ADIIS) cannot compile at these shapes
over the TPU tunnel: `scf_iteration` takes SCFSystem as a static jit arg,
so this JAX version inlines the f64 AO planes as MLIR literal constants
(jax/_src/array.py `_array_mlir_constant_handler`) and the remote compile
request exceeds the tunnel's HTTP body limit (413) once the planes pass
~100 MB (CuO 26 MB compiles; Ca3P2 193 MB / ABAQ 918 MB do not).  The
staged runner feeds the planes as runtime arguments, so its programs
compile at every shape up to the 117-atom north star -- run the annealing
ladder through it instead.

Usage: python tools/rescue_staged_ladder.py [MOL ...]   (default: ABAQ Ca3P2)
Merges converged rows into docs/results_58.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "docs", "results_58.json")


def main() -> int:
    names = sys.argv[1:] or ["Ca3P2", "ABAQ"]
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.basis.data import provenance
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.scf.driver import (
        scf_host_annealed,
        scf_host_staged,
    )

    results = json.load(open(OUT)) if os.path.exists(OUT) else {}
    for name in names:
        mol = from_xyz_file(os.path.join(HERE, "molecules", name + ".xyz"))
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            setup = kohn_sham.prepare(mol, "B3LYP", grid_level=3)
        setup_s = time.time() - t0
        t0 = time.time()
        mixer = os.environ.get("RESCUE_MIXER", "cdiis")
        kts_env = os.environ.get("RESCUE_KTS", "")
        extra = {}
        if kts_env:
            extra["kts"] = tuple(float(v) for v in kts_env.split(","))
        if mc := os.environ.get("RESCUE_MAX_CYCLE", ""):
            extra["max_cycle"] = int(mc)
        if rt := os.environ.get("RESCUE_RUNG_TOL_D", ""):
            extra["rung_conv_tol_d"] = float(rt)
        if rte := os.environ.get("RESCUE_RUNG_TOL_E", ""):
            extra["rung_conv_tol_e"] = float(rte)
        if al := os.environ.get("RESCUE_ALPHA", ""):
            extra["mix_alpha"] = float(al)
        if dm0p := os.environ.get("RESCUE_DM0", ""):
            # warm-start the ladder from a saved density (e.g. a CPU
            # low-grid anneal that already found the right basin --
            # ABAQ's smeared landscape has several stationary states
            # tens of Eh apart in bare E)
            import numpy as np

            extra["dm0"] = np.load(dm0p)
        def cb(cycle, eb, de, dnorm):
            if cycle % 10 == 0:
                print(f"  cyc {cycle:3d} E={float(eb.e_tot):.8f} "
                      f"dD={float(dnorm):.2e}", flush=True)

        r = scf_host_annealed(
            setup.sys, setup.functional,
            runner=scf_host_staged,
            xc_impl=os.environ.get("RESCUE_XC", "fast"), mixer=mixer,
            callback=cb if os.environ.get("RESCUE_VERBOSE") else None,
            **extra,
        )
        if sdm := os.environ.get("RESCUE_SAVE_DM", ""):
            # persist the final density (converged or not) so successive
            # rescue attempts can chain warm starts
            import numpy as np

            if r is not None and getattr(r, "dm", None) is not None:
                np.save(sdm, np.asarray(r.dm))
                print(f"  saved dm -> {sdm}", flush=True)
        if (r is not None and r.converged and r.smear_kt > 0
                and "rung_conv_tol_d" in extra):
            # the ladder returned a SMEARED rung converged only to the
            # loosened rung tolerance (integer finish failed) -- re-run
            # that kT at the caller's full convergence rule so the
            # recorded row meets the same bar as every other sweep row
            print(f"  tightening kT={r.smear_kt} to the full rule",
                  flush=True)
            rt = scf_host_staged(
                setup.sys, setup.functional, smear_kt=r.smear_kt,
                dm0=r.dm,
                xc_impl=os.environ.get("RESCUE_XC", "fast"), mixer=mixer,
                max_cycle=extra.get("max_cycle", 300),
                callback=cb if os.environ.get("RESCUE_VERBOSE") else None,
            )
            if rt.converged:
                rt.smear_kt = r.smear_kt
                r = rt
            else:
                r = None  # loose rung alone must not count as converged
        scf_s = time.time() - t0
        print(f"{name}: conv={getattr(r, 'converged', None)} "
              f"E={getattr(r, 'e_tot', float('nan')):.8f} "
              f"kT={getattr(r, 'smear_kt', None)} "
              f"cyc={getattr(r, 'n_iter', None)} scf={scf_s:.1f}s "
              f"setup={setup_s:.1f}s", flush=True)
        if r is not None and r.converged:
            results[f"{name}/B3LYP"] = {
                "molecule": name,
                "functional": "B3LYP",
                "natom": len(mol.symbols),
                "nao": setup.nao,
                "ngrid": setup.ngrid,
                "density_fit": setup.sys.df_j3c is not None,
                "grid_level": 3,
                "xc_impl": os.environ.get("RESCUE_XC", "fast"),
                "e_tot": float(r.e_tot),
                "converged": True,
                "n_iter": int(r.n_iter),
                "smear_kt": r.smear_kt,
                "scf_s": round(scf_s, 2),
                "setup_s": round(setup_s, 1),
                "basis_provenance": sorted(
                    {provenance(s) for s in mol.symbols}),
            }
            tmp = OUT + ".tmp"
            with open(tmp, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)
            os.replace(tmp, OUT)
        import gc

        import jax
        jax.clear_caches()
        gc.collect()
    return 0


if __name__ == "__main__":
    sys.exit(main())
