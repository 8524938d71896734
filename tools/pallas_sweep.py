"""A/B one Pallas XC kernel config at a given molecule shape (TPU).

Env knobs are read at pallas_xc import time, so each config runs in its
own process:

    DFT_PALLAS_TILE=6144 DFT_PALLAS_VPU_REDUCE=1 \
        python tools/pallas_sweep.py DHA 3

Prints one JSON line: {molecule, tile, vpu_reduce, npad, gpad, ms, ...}.
Timing is the rep-differencing estimator of bench.py (the dispatch +
tunnel round-trip cancels in t(n1+dn) - t(n1)).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mol_name = sys.argv[1] if len(sys.argv) > 1 else "DHA"
    grid_level = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    phi_split = os.environ.get("SWEEP_PHI_SPLIT", "0") == "1"

    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.engine.pallas_xc import (
        DEFAULT_TILE,
        _npad_for,
        _tile_for,
        pack_pallas_inputs,
        xc_step_pallas_packed,
    )
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.scf.driver import initial_guess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol = from_xyz_file(os.path.join(here, "molecules", f"{mol_name}.xyz"))
    setup = kohn_sham.prepare(mol, "B3LYP", grid_level=grid_level)
    pk = pack_pallas_inputs(setup.sys.ao, setup.sys.weights,
                            setup.sys.ao_grad, n_grad=True)
    dm = initial_guess(setup.sys)
    n = setup.sys.ao.shape[1]
    nrow, gpad = pk[0].shape

    def call():
        return xc_step_pallas_packed(setup.functional, dm, pk[0], pk[1],
                                     pk[2], n, phi_split=phi_split)

    def time_reps(reps):
        tot = None
        t0 = time.time()
        for _ in range(reps):
            exc, _v = call()
            tot = exc if tot is None else tot + exc
        _ = float(tot)
        return time.time() - t0

    exc, _ = call()
    e_val = float(exc)  # warm/compile
    pilot = max((time_reps(12) - time_reps(4)) / 8.0, 2e-4)
    dn = max(8, min(2000, int(0.35 / pilot)))
    n1 = max(2, dn // 8)
    ms = (time_reps(n1 + dn) - time_reps(n1)) / dn * 1000.0
    print(json.dumps({
        "molecule": mol_name, "grid_level": grid_level,
        "tile_env": os.environ.get("DFT_PALLAS_TILE"),
        "vpu_reduce": os.environ.get("DFT_PALLAS_VPU_REDUCE", "1"),
        "phi_split": phi_split,
        "nao": n, "nrow": nrow, "gpad": gpad,
        "tile": _tile_for(_npad_for(n), DEFAULT_TILE),
        "n_tiles": gpad // _tile_for(_npad_for(n), DEFAULT_TILE),
        "ms": round(ms, 4), "e_xc": e_val,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
