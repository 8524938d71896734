"""SCF checkpoint / resume.

The reference keeps all SCF state in memory and always restarts from the
Hcore guess (SURVEY.md section 5: "Checkpoint / resume: None").  Here the
converged (or in-progress) density matrix plus metadata round-trips
through a plain .npz file; ``scf_host(dm0=...)`` resumes from it.
"""

from __future__ import annotations

import numpy as np


def save_checkpoint(path: str, dm, e_tot: float, cycle: int,
                    functional: str, molecule: str = "") -> None:
    np.savez(
        path,
        dm=np.asarray(dm),
        e_tot=float(e_tot),
        cycle=int(cycle),
        functional=functional,
        molecule=molecule,
    )


def load_checkpoint(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        return {
            "dm": f["dm"],
            "e_tot": float(f["e_tot"]),
            "cycle": int(f["cycle"]),
            "functional": str(f["functional"]),
            "molecule": str(f["molecule"]),
        }
