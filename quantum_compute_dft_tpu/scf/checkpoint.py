"""SCF checkpoint / resume.

The reference keeps all SCF state in memory and always restarts from the
Hcore guess (SURVEY.md section 5: "Checkpoint / resume: None").  Here the
converged (or in-progress) density matrix plus metadata round-trips
through a plain .npz file; ``scf_host(dm0=...)`` resumes from it.

Mid-run checkpointing (round 5): ``periodic_saver`` builds the
``checkpoint_cb`` that ``scf_host_staged`` invokes every N cycles, so a
crash at cycle 200 of a 20-minute north-star run resumes from the last
periodic save instead of the Hcore guess.  Saves are atomic (tmp file +
os.replace): a crash mid-write can never corrupt the previous good
checkpoint.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, dm, e_tot: float, cycle: int,
                    functional: str, molecule: str = "") -> None:
    # atomic: numpy appends .npz to bare paths, so write through an
    # explicit file handle at a tmp name and rename over the target
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(
            fh,
            dm=np.asarray(dm),
            e_tot=float(e_tot),
            cycle=int(cycle),
            functional=functional,
            molecule=molecule,
        )
    os.replace(tmp, str(path))


def periodic_saver(path: str, functional: str, molecule: str = ""):
    """-> checkpoint_cb(cycle, dm, e_tot) for scf_host_staged: saves the
    in-progress density atomically at `path` (same format resume reads)."""

    def cb(cycle: int, dm, e_tot: float) -> None:
        save_checkpoint(path, dm, e_tot, cycle, functional, molecule)

    return cb


def load_checkpoint(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        return {
            "dm": f["dm"],
            "e_tot": float(f["e_tot"]),
            "cycle": int(f["cycle"]),
            "functional": str(f["functional"]),
            "molecule": str(f["molecule"]),
        }
