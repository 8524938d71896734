"""Import canonical basis data from an NWChem-format .dat file.

Usage: python tools/import_basis.py path/to/sto-3g.dat [--write]

Parses NWChem-format basis blocks (the format PySCF/Basis-Set-Exchange
distribute) and reports differences against the in-tree STO-3G tables
(quantum_compute_dft_tpu/basis/data.py).  With --write, emits a
``sto3g_override.py`` module holding exact per-element shell tables that
basis_set.build_basis will prefer over the generated ones.

The in-tree tables are canonical for periods 1-3 and reconstructed beyond
(see basis/data.py); this tool closes that gap whenever canonical data
becomes available in the environment.
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_nwchem(text: str):
    """-> {element: [(shell_letter, [(exp, c1[, c2]) ...]), ...]}"""
    out: dict[str, list] = {}
    cur = None
    for raw in text.splitlines():
        line = raw.split("#")[0].strip()
        if not line or line.upper().startswith(("BASIS", "END")):
            continue
        parts = line.split()
        if parts[0][0].isalpha():
            el, shell = parts[0], parts[1].upper()
            el = el[0].upper() + el[1:].lower()
            out.setdefault(el, []).append((shell, []))
            cur = out[el][-1][1]
        else:
            if cur is None:
                raise ValueError(f"primitive row before shell header: {line!r}")
            cur.append(tuple(float(x.replace("D", "E").replace("d", "e"))
                             for x in parts))
    return out


def to_shell_table(parsed):
    """-> {element: [(l, alphas, coeffs), ...]} splitting SP/SPD shells."""
    lmap = {"S": 0, "P": 1, "D": 2, "F": 3, "G": 4}
    out = {}
    for el, shells in parsed.items():
        rows = []
        for shell, prims in shells:
            exps = [p[0] for p in prims]
            if shell in lmap:
                rows.append((lmap[shell], tuple(exps),
                             tuple(p[1] for p in prims)))
            else:  # SP, SPD composite shells share exponents
                for k, letter in enumerate(shell):
                    rows.append((lmap[letter], tuple(exps),
                                 tuple(p[1 + k] for p in prims)))
        out[el] = rows
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("datfile")
    ap.add_argument("--write", action="store_true",
                    help="write basis/sto3g_override.py")
    args = ap.parse_args(argv)

    with open(args.datfile) as f:
        table = to_shell_table(parse_nwchem(f.read()))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from quantum_compute_dft_tpu.basis.data import element_shells

    print(f"parsed {len(table)} elements")
    for el, rows in sorted(table.items()):
        try:
            ours = element_shells(el)
        except Exception:
            print(f"  {el}: not in our tables")
            continue
        if len(ours) != len(rows):
            print(f"  {el}: shell count differs ({len(ours)} vs {len(rows)})")
            continue
        worst = 0.0
        for (name, l, a, c), (l2, a2, c2) in zip(ours, rows):
            if l != l2 or len(a) != len(a2):
                worst = float("inf")
                break
            worst = max(worst, max(abs(x - y) / abs(y) for x, y in zip(a, a2)))
        print(f"  {el}: max rel exponent deviation {worst:.2e}")

    if args.write:
        dest = os.path.join(
            os.path.dirname(__file__), "..",
            "quantum_compute_dft_tpu", "basis", "sto3g_override.py",
        )
        with open(dest, "w") as f:
            f.write('"""Canonical STO-3G tables imported by tools/'
                    'import_basis.py -- preferred over data.py."""\n\n')
            f.write(f"SHELLS = {table!r}\n")
        print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
