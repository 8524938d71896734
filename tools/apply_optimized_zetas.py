"""Write basis/zeta_optimized.py from an optimizer results JSON.

Input: the JSON produced by the round-3 heavy-element run of
basis/atomic_scf.optimize_zetas (one entry per element:
{"zetas": {shell: zeta}, "e_opt": .., "e_table": .., "frozen": shell}).
Shells listed in "frozen" were held at their molecular-convention table
values (the standard transition-metal valence scale factor of the
published STO-3G derivations) and ARE emitted at those values: holding
them is a deliberate step of the optimized derivation, so the element's
provenance tier is 'optimized' as a whole rather than inheriting the
pre-optimization tag of the convention shell.

Usage: python tools/apply_optimized_zetas.py /tmp/opt_heavy.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = '''"""Variationally optimized STO-3G zetas for Z = 21-54 (GENERATED).

Produced by tools/apply_optimized_zetas.py from a run of
basis/atomic_scf.optimize_zetas: spherically-averaged spin-resolved
atomic-HF energy minimization over each element's shell zetas -- the
derivation procedure behind the published STO-3G tables, re-executed
because the canonical numeric tables for Z = 21-54 are unobtainable in
this offline environment (no PySCF, zero egress; see VERDICT r2 item 2).
Validation: the same optimizer run on canonical elements lands within
~1% (O: 1s 7.694 / 2sp 2.226 vs published 7.66 / 2.25).

Metal valence shells (e.g. Cu 4sp, Mo 5sp) are NOT free-atom-minimized --
that gives diffuse exponents that are wrong in molecules (cf. Na 3sp:
best-atom 0.84 vs published molecular 1.75); they are deliberately held
at the molecular-convention scale factor of the published derivations
and emitted here at that value.

Provenance tier: 'optimized' -- physically derived, same procedure as
canonical, but NOT the published numbers; sub-1e-6 Eh parity with
reference sto-3g runs remains unclaimable for these elements.
"""

'''


def main(path: str) -> int:
    with open(path) as f:
        data = json.load(f)
    # MERGE into the already-shipped table: an incremental optimizer run
    # (e.g. the round-4 Zr-Cd batch) must not drop the elements an
    # earlier run produced
    out = {}
    try:
        from quantum_compute_dft_tpu.basis.zeta_optimized import OPTIMIZED

        out.update({k: dict(v) for k, v in OPTIMIZED.items()})
    except ImportError:
        pass
    for sym, row in data.items():
        if "error" in row:
            print(f"skip {sym}: {row['error']}")
            continue
        out[sym] = dict(row["zetas"])  # frozen shells included (see above)
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "quantum_compute_dft_tpu", "basis", "zeta_optimized.py",
    )
    with open(dst, "w") as f:
        f.write(HEADER)
        f.write("OPTIMIZED: dict[str, dict[str, float]] = {\n")
        for sym in sorted(out):
            f.write(f"    {sym!r}: {out[sym]!r},\n")
        f.write("}\n")
    print(f"wrote {dst} ({len(out)} elements)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_heavy.json"))
