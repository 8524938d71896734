"""Spherically-averaged atomic Hartree-Fock and variational zeta optimization.

The published STO-3G tables (Hehre/Stewart/Pople JCP 51, 2657 (1969);
Pietro/Hehre and successors for Z > 18) derive each element's Slater
exponents by *energy minimization at the atomic SCF level* (valence
exponents of H and the first row were afterwards rescaled on small
molecules).  The canonical numeric tables for Z = 21-54 are not
obtainable in this offline environment (no PySCF, zero egress), so this
module re-runs the derivation itself: a fractional-occupation,
spherically-averaged restricted HF atom solver plus a coordinate-descent
optimizer over the per-shell zetas.

Validation contract (tests/test_basis.py): run on elements whose
canonical zetas ARE embedded (periods 1-3) the optimizer must land
within ~1% on core shells -- same-procedure evidence that the Z = 21-54
values it produces are the right kind of numbers.  Provenance for
optimized elements is 'optimized' (better than 'estimated', still
distinct from 'canonical'; see basis/data.py).

Spherical averaging: the Fock operator of a spherically-symmetrized
density is block-diagonal in (l, m) and m-degenerate, so the SCF solves
one radial subproblem per l channel and replicates over m.  Occupations
are the configuration-averaged f = n_sub / (2l+1) electrons per m --
the standard construction behind Clementi-Raimondi-style exponent
optimizations.
"""

from __future__ import annotations

import numpy as np

from quantum_compute_dft_tpu.basis.basis_set import build_basis
from quantum_compute_dft_tpu.basis.data import ZETA, shells_for_z
from quantum_compute_dft_tpu.mol.elements import Z_OF
from quantum_compute_dft_tpu.mol.molecule import Molecule

# aufbau with the d-block anomalies that matter for Z <= 54
_AUFBAU = ["1s", "2s", "2p", "3s", "3p", "4s", "3d", "4p", "5s", "4d", "5p"]
_CAP = {"s": 2, "p": 6, "d": 10}
_ANOMALIES = {  # Z -> {subshell: electrons} overrides
    24: {"4s": 1, "3d": 5},   # Cr
    29: {"4s": 1, "3d": 10},  # Cu
    41: {"5s": 1, "4d": 4},   # Nb
    42: {"5s": 1, "4d": 5},   # Mo
    44: {"5s": 1, "4d": 7},   # Ru
    45: {"5s": 1, "4d": 8},   # Rh
    46: {"5s": 0, "4d": 10},  # Pd
    47: {"5s": 1, "4d": 10},  # Ag
}


def ground_config(z: int) -> dict[str, int]:
    """Neutral-atom electron configuration {subshell: electrons}."""
    cfg: dict[str, int] = {}
    rem = z
    for sub in _AUFBAU:
        take = min(_CAP[sub[-1]], rem)
        if take:
            cfg[sub] = take
        rem -= take
        if rem == 0:
            break
    for sub, n in _ANOMALIES.get(z, {}).items():
        cfg[sub] = n
    return {k: v for k, v in cfg.items() if v > 0}


def _one_atom(symbol: str) -> Molecule:
    return Molecule(symbols=(symbol,), coords=np.zeros((1, 3)))


def _channel_occupations(symbol: str) -> tuple[dict, dict]:
    """Per-spin, per-l-channel radial occupations (electrons per m
    component), lowest radial orbital first, high-spin (Hund) filling:
    Cu -> alpha {0: [1,1,1,1], 1: [1,1], 2: [1]},
          beta  {0: [1,1,1,0], 1: [1,1], 2: [1]}."""
    cfg = ground_config(Z_OF[symbol])
    occ_a: dict[int, list[float]] = {}
    occ_b: dict[int, list[float]] = {}
    for sub in _AUFBAU:  # energetic fill order within each l channel is by n
        if sub not in cfg:
            continue
        l = "spd".index(sub[-1])
        na = min(cfg[sub], 2 * l + 1)
        nb = cfg[sub] - na
        occ_a.setdefault(l, []).append(na / (2 * l + 1))
        occ_b.setdefault(l, []).append(nb / (2 * l + 1))
    return occ_a, occ_b


def atomic_energy(
    symbol: str,
    zetas: dict[str, float] | None = None,
    return_scf: bool = False,
    max_cycle: int = 200,
    conv_tol: float = 1e-10,
):
    """Spherically-averaged fractional-occupation RHF energy of the
    neutral atom in the STO-3G basis scaled by `zetas` (defaults to the
    ZETA table).  Runs entirely on small host matrices."""
    import warnings

    from quantum_compute_dft_tpu.integrals import eri_full, one_electron

    mol = _one_atom(symbol)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        basis = build_basis(
            mol, zeta_override={symbol: zetas} if zetas else None
        )
    s, t, v = one_electron(basis, mol.coords, mol.charges)
    h = t + v
    eri = np.asarray(eri_full(basis))

    # AO bookkeeping: for each l channel, the radial-shell AO offsets
    # (one column per shell; component m lives at offset + m)
    ao_start = []
    io = 0
    for sh in basis.shells:
        ao_start.append((sh.l, io))
        io += 2 * sh.l + 1
    chan: dict[int, list[int]] = {}
    for l, start in ao_start:
        chan.setdefault(l, []).append(start)
    occ_a, occ_b = _channel_occupations(symbol)

    def density(f, occ):
        d = np.zeros_like(s)
        for l, starts in chan.items():
            if l not in occ:
                continue
            idx0 = np.asarray(starts)
            fb = f[np.ix_(idx0, idx0)]
            sb = s[np.ix_(idx0, idx0)]
            # generalized eigh on the tiny radial block
            import scipy.linalg as sla

            w, c = sla.eigh(fb, sb)
            focc = occ[l]
            for i, fo in enumerate(focc):
                if fo == 0.0:
                    continue
                ci = c[:, i]
                for m in range(2 * l + 1):
                    idx = idx0 + m
                    d[np.ix_(idx, idx)] += fo * np.outer(ci, ci)
        return d

    # spin-resolved (UHF-style) spherically-averaged SCF: removes the
    # self-interaction the closed-shell functional would put on open
    # shells (one-electron H is exact: E = h_11)
    da = density(h, occ_a)
    db = density(h, occ_b)
    e_old = 0.0
    for _ in range(max_cycle):
        # host einsum, not the jitted engine ops: the matrices are tiny
        # (nao <= 28) and per-cycle device dispatch would dominate
        j = np.einsum("ijkl,kl->ij", eri, da + db, optimize=True)
        ka = np.einsum("ikjl,kl->ij", eri, da, optimize=True)
        kb = np.einsum("ikjl,kl->ij", eri, db, optimize=True)
        fa = h + j - ka
        fb = h + j - kb
        d = da + db
        e = float(np.sum(d * h) + 0.5 * np.sum(d * j)
                  - 0.5 * np.sum(da * ka) - 0.5 * np.sum(db * kb))
        da_new = density(fa, occ_a)
        db_new = density(fb, occ_b)
        if abs(e - e_old) < conv_tol:
            da, db = da_new, db_new
            break
        da = 0.6 * da_new + 0.4 * da  # damping: 3d/4s near-degeneracy
        db = 0.6 * db_new + 0.4 * db
        e_old = e
    if return_scf:
        return e, da + db
    return e


def optimize_zetas(
    symbol: str,
    sweeps: int = 4,
    rel_step: float = 0.03,
    verbose: bool = False,
    frozen_shells: tuple[str, ...] = (),
) -> tuple[dict[str, float], float]:
    """Coordinate-descent energy minimization over the element's shell
    zetas; parabolic line search per coordinate.  -> (zetas, energy).

    `frozen_shells` are kept at their table values: metal valence shells
    use molecular conventions that a free-atom minimization would wrongly
    diffuse (cf. Na 3sp: best-atom 0.84 vs published molecular 1.75)."""
    z = Z_OF[symbol]
    shells = shells_for_z(z)
    zetas = {sh: ZETA[symbol][sh][0] for sh in shells}
    free = [sh for sh in shells if sh not in frozen_shells]
    e = atomic_energy(symbol, zetas)
    if verbose:
        print(f"{symbol}: start E = {e:.6f}  zetas = {zetas}")
    for sweep in range(sweeps):
        step = rel_step / (2.0 ** sweep)
        improved = False
        for sh in free:
            z0 = zetas[sh]
            trials = {}
            for fac in (1.0 - step, 1.0 + step):
                zt = dict(zetas, **{sh: z0 * fac})
                trials[fac] = atomic_energy(symbol, zt)
            em, e0, ep = trials[1.0 - step], e, trials[1.0 + step]
            denom = em - 2.0 * e0 + ep
            if denom > 0:  # convex: parabola vertex, clipped to +-2 steps
                delta = 0.5 * (em - ep) / denom * step
                delta = float(np.clip(delta, -2.0 * step, 2.0 * step))
            else:  # walk downhill one step
                delta = -step if em < ep else step
            z_new = z0 * (1.0 + delta)
            e_new = atomic_energy(symbol, dict(zetas, **{sh: z_new}))
            # keep the best of the four evaluations
            best = min(
                [(e0, z0), (em, z0 * (1 - step)), (ep, z0 * (1 + step)),
                 (e_new, z_new)]
            )
            if best[0] < e - 1e-12:
                e, zetas[sh] = best[0], best[1]
                improved = True
            if verbose:
                print(f"  {sh}: zeta {z0:.4f} -> {zetas[sh]:.4f}  "
                      f"E = {e:.6f}")
        if not improved:
            break
    return zetas, e
