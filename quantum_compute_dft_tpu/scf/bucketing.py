"""Shape bucketing: cross-molecule compiled-program reuse for the sweep.

The round-3 58-molecule sweep paid 20-60 s of remote XLA compiles PER
MOLECULE (docs/RESULTS.md: NH3, nao=8, spent 254 s in "SCF"), because
every molecule is a new (nao, ngrid) shape AND the jitted cycle programs
took the SCFSystem as an identity-hashed static argument, baking its
tensors into the HLO as constants -- so even same-shape molecules missed
both the in-process jit cache and the persistent compile cache.

The fix has two halves:

* driver._sys_split / _ArgSys: in shared mode the cycle programs receive
  a value-hashable key as their static argument and the molecule tensors
  (plus a TRACED nocc) as a dynamic pytree -- one compiled program per
  bucket shape, reused across molecules and across processes.
* this module: zero-pad an in-core system to a small set of bucket
  shapes, so the 58 sweep shapes collapse onto a handful of programs.

Padding is exact, not approximate:

* grid rows are padded with zero AO values AND zero quadrature weights
  -- their XC contribution vanishes identically (same contract as the
  Pallas gpad tiles, engine/pallas_xc.py).
* AO padding extends S by an identity block (so X = S^(-1/2) extends by
  identity), Hcore by a large positive diagonal (spurious orbitals land
  far above every physical virtual and are never occupied -- nocc is
  unchanged), and the ERI / AO-plane / SAD entries by zeros (padded
  orbitals couple to nothing).  The padded block of every density built
  from such a Fock is exactly zero, so J/K/XC/energies match the
  unpadded system to roundoff (asserted in tests/test_bucketing.py).

The reference has no counterpart (one molecule per process, PySCF does
the setup: ref dft.py:101-116); this is TPU-native operational hygiene
for the XLA compilation model.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from quantum_compute_dft_tpu.scf.driver import SCFSystem, make_system

# COARSE ladders, deliberately: every distinct (nao, grid) bucket pair
# pays one full cycle-program compile set (~100-150 s of remote XLA over
# the tunnel, measured round 4), while padding waste costs only
# milliseconds of per-cycle compute at these sizes.  The first cold-demo
# run used a 1.3x grid ladder and nearly every molecule landed on its
# own rung -- zero reuse.  With 2x rungs the small half of the 58-sweep
# collapses onto two or three shapes.
NAO_BUCKETS = (16, 32, 48, 64, 96, 128, 160)


def nao_bucket(n: int) -> int:
    for b in NAO_BUCKETS:
        if n <= b:
            return b
    return -(-n // 32) * 32


def grid_bucket(g: int) -> int:
    """2x geometric ladder: at most 2x zero-weight padding (a few ms of
    XC per cycle) against one compile set per rung."""
    b = 49152
    while b < g:
        b *= 2
    return b


def bucketize_system(sys: SCFSystem, n_bucket: int | None = None,
                     g_bucket: int | None = None):
    """-> (padded SCFSystem with shared_key set, (nao, ngrid) logical
    sizes).  In-core systems only; DF / lean-AO systems are returned
    unchanged (their per-molecule compiles are amortized by their much
    longer SCFs, and the DF builder closures cannot travel as jit
    arguments).  n_bucket / g_bucket override the ladder (tests; callers
    that want a shared shape across a known set)."""
    if sys.eri is None or sys.ao is None:
        return sys, (sys.hcore.shape[0],
                     sys.weights.shape[0])
    n = int(sys.hcore.shape[0])
    g = int(sys.ao.shape[0])
    nb = max(n_bucket or 0, nao_bucket(n))
    gb = max(g_bucket or 0, grid_bucket(g))
    # padded-ERI byte budget: padding scales as (nb/n)^4, so a molecule
    # near the top of the in-core range that fits unpadded can OOM the
    # 16 GB chip once bucketed (nao 130 -> bucket 160 grows the f64 ERI
    # 2.3 -> 5.2 GB).  Above the budget, skip bucketing and let the
    # molecule pay its own compile -- the same bailout class as the
    # DF/lean-AO return above.
    if nb ** 4 * 8 > float(os.environ.get("DFT_BUCKET_ERI_BYTES", 3.5e9)):
        return sys, (n, g)

    hcore = np.zeros((nb, nb))
    h0 = np.asarray(sys.hcore)
    hcore[:n, :n] = h0
    # spurious-orbital shelf: far above every physical virtual, but only
    # a small multiple of the existing spectral range so the sign-
    # projector's Newton-Schulz scale (driver._sign_projector_at) is not
    # degraded
    big = 2.0 * float(np.abs(h0).max()) + 100.0
    for i in range(n, nb):
        hcore[i, i] = big
    s = np.eye(nb)
    s[:n, :n] = np.asarray(sys.s)
    eri = np.zeros((nb, nb, nb, nb))
    eri[:n, :n, :n, :n] = np.asarray(sys.eri)
    ao = np.zeros((gb, nb))
    ao[:g, :n] = np.asarray(sys.ao)
    w = np.zeros(gb)
    w[:g] = np.asarray(sys.weights)
    ao_grad = None
    if sys.ao_grad is not None:
        ao_grad = np.zeros((3, gb, nb))
        ao_grad[:, :g, :n] = np.asarray(sys.ao_grad)
    sad = None
    if sys.dm_sad is not None:
        sad = np.zeros(nb)
        sad[:n] = np.asarray(sys.dm_sad.diagonal())

    padded = make_system(hcore, s, eri, ao, w, ao_grad, sys.e_nuc,
                         sys.nocc, sad_occ=sad, nopen=sys.nopen)
    padded = dataclasses.replace(
        padded, shared_key=("bucketed", nb, gb, sys.nopen))
    return padded, (n, g)
