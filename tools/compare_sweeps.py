"""Compare two 58-sweep result files (round-over-round energy audit).

Run: python tools/compare_sweeps.py docs/results_58.json docs/results_58_r5.json

Classifies each energy delta:
  - parity        |dE| <= 2e-6 (same stack class)
  - colder-kT     both smeared, new kT < old kT (annealed further; lower
                  free energy is the better physics)
  - spurious-fix  old row converged suspiciously fast (<= 6 cycles) on a
                  heavy-element molecule and the new stack's verify tail
                  moved it (the round-4 f32 spurious-fixed-point class)
  - UNEXPLAINED   anything else (investigate!)
"""

from __future__ import annotations

import json
import os
import sys

HEAVY = ("Cu", "As", "Se", "Br", "Mo", "I")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _has_heavy(mol_name: str) -> bool:
    path = os.path.join(HERE, "molecules", f"{mol_name}.xyz")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        return any(p[0] in HEAVY for line in f
                   if len(p := line.split()) == 4)


def main() -> int:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    rows = []
    unexplained = 0
    for k, nv in sorted(new.items()):
        ov = old.get(k)
        if ov is None or "error" in nv or "error" in ov:
            continue
        de = nv["e_tot"] - ov["e_tot"]
        if abs(de) <= 2e-6:
            klass = "parity"
        elif ov.get("smear_kt") and nv["smear_kt"] < ov["smear_kt"]:
            # includes kT -> 0: the new stack reached the INTEGER ground
            # state where the old one only converged smeared
            klass = "colder-kT"
        elif ov["n_iter"] <= 6 and _has_heavy(k.split("/")[0]):
            klass = "spurious-fix"
        else:
            klass = "UNEXPLAINED"
            unexplained += 1
        rows.append((k, ov["e_tot"], nv["e_tot"], de, klass,
                     ov["scf_s"], nv["scf_s"]))
    print(f"{'molecule':32s} {'dE (Eh)':>12s}  class         "
          f"{'scf_s old':>9s} {'new':>7s}")
    for k, eo, en, de, klass, so, sn in rows:
        if klass != "parity":
            print(f"{k:32s} {de:12.3e}  {klass:12s}  {so:9.1f} {sn:7.1f}")
    n_par = sum(1 for r in rows if r[4] == "parity")
    t_old = sum(r[5] for r in rows)
    t_new = sum(r[6] for r in rows)
    print(f"\n{len(rows)} shared rows: {n_par} at parity (<=2e-6), "
          f"{len(rows)-n_par} explained/flagged, {unexplained} UNEXPLAINED")
    print(f"total SCF wall-clock: {t_old/60:.1f} min -> {t_new/60:.1f} min "
          f"({t_old/max(t_new,1e-9):.1f}x)")
    return 1 if unexplained else 0


if __name__ == "__main__":
    sys.exit(main())
