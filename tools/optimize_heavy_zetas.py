"""Run the variational zeta optimizer over the Z=21-54 elements.

Produces the JSON consumed by tools/apply_optimized_zetas.py: one entry
per element {"zetas": {...}, "e_opt": .., "e_table": .., "frozen": shell}.

Frozen shells (kept at their molecular-convention table values, the same
convention as the published STO-3G tables): metal valence sp shells,
where a free-atom minimization drifts to diffuse exponents that are
wrong in molecules (Sc-Zn 4sp; Rb-Cd 5sp).  Main-group valence shells
(Ga-Kr 4sp, In-Xe 5sp) optimize freely -- for p-block atoms the
free-atom optimum tracks the molecular value to ~1% (validated on O:
optimizer 2sp 2.226 vs published 2.25).

Usage:
  python tools/optimize_heavy_zetas.py [out.json] [SYMBOL ...]
(no symbols = all Z=21-54; writes/merges into out.json after each
element so the run is resumable).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PERIOD4_METALS = ["Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn"]
PERIOD4_MAIN = ["Ga", "Ge", "As", "Se", "Br", "Kr"]
PERIOD5_METALS = ["Rb", "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh",
                  "Pd", "Ag", "Cd"]
PERIOD5_MAIN = ["In", "Sn", "Sb", "Te", "I", "Xe"]
ALL = PERIOD4_METALS + PERIOD4_MAIN + PERIOD5_METALS + PERIOD5_MAIN


def frozen_for(symbol: str) -> tuple[str, ...]:
    if symbol in PERIOD4_METALS:
        return ("4sp",)
    if symbol in PERIOD5_METALS:
        return ("5sp",)
    return ()


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_heavy.json"
    symbols = sys.argv[2:] or ALL
    from quantum_compute_dft_tpu.basis.atomic_scf import (
        atomic_energy, optimize_zetas,
    )
    from quantum_compute_dft_tpu.basis.data import ZETA, shells_for_z
    from quantum_compute_dft_tpu.mol.elements import Z_OF

    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for sym in symbols:
        if sym in results and "error" not in results[sym]:
            print(f"{sym}: cached in {out_path}, skipping", flush=True)
            continue
        t0 = time.time()
        frozen = frozen_for(sym)
        try:
            table = {sh: ZETA[sym][sh][0] for sh in shells_for_z(Z_OF[sym])}
            e_table = atomic_energy(sym, table)
            zetas, e_opt = optimize_zetas(
                sym, frozen_shells=frozen, verbose=True
            )
            results[sym] = {
                "zetas": zetas,
                "e_opt": e_opt,
                "e_table": e_table,
                # apply_optimized_zetas expects a single shell name here
                "frozen": frozen[0] if frozen else None,
            }
            print(f"{sym}: E {e_table:.6f} -> {e_opt:.6f} "
                  f"(dE {e_opt - e_table:+.6f}, {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as exc:  # resumable: record and move on
            results[sym] = {"error": repr(exc)}
            print(f"{sym}: FAILED {exc!r}", flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
