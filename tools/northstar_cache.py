"""Build the 117-atom north star's expensive setup artifact -- the
pivoted-Cholesky ERI vectors -- on the real TPU chip and save it to disk.

The previous round paid 6,602 s for this factorization on the 1-core CPU
host (docs/northstar_dryrun.json).  The quartet panels are fixed-shape
batched dispatches (integrals/cholesky.py), so they run orders of
magnitude faster on the TPU; only the O(npair * rank) pivot downdates
stay on the host.  The saved L tensor then feeds the CPU-mesh SPMD
convergence run (tools/converge_northstar.py) through the same
``_df_override`` hook the dryrun used, removing the factorization from
its critical path entirely.

Run (TPU):  python tools/northstar_cache.py
Writes:     .cache/northstar_L_tol<tol>.npz  (~1.8 GB at tol 1e-4)
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
    from quantum_compute_dft_tpu.basis import build_basis
    from quantum_compute_dft_tpu.integrals.cholesky import cholesky_eri_vectors
    from quantum_compute_dft_tpu.mol import from_xyz_file

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol_name = os.environ.get("NORTHSTAR_MOL", "C33H56N7O17P3S")
    cd_tol = float(os.environ.get("NORTHSTAR_CD_TOL", "1e-4"))
    mol = from_xyz_file(os.path.join(here, "molecules", f"{mol_name}.xyz"))
    bas = build_basis(mol)

    t_cd = time.time()
    l_vec = cholesky_eri_vectors(bas, tol=cd_tol, verbose=True)
    t_cd = time.time() - t_cd

    cache_dir = os.path.join(here, ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    out_path = os.path.join(cache_dir, f"northstar_L_{mol_name}_tol{cd_tol:g}.npz")
    tmp = out_path + ".tmp.npz"
    np.savez(tmp, l_vec=np.asarray(l_vec), cd_tol=cd_tol)
    os.replace(tmp, out_path)

    print(json.dumps({
        "molecule": mol_name,
        "nao": int(bas.nao),
        "cd_rank": int(l_vec.shape[2]),
        "cd_tol": cd_tol,
        "cd_s": round(t_cd, 1),
        "total_s": round(time.time() - t0, 1),
        "path": out_path,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
