"""STO-3G basis data.

The STO-3G basis (Hehre, Stewart, Pople, JCP 51, 2657 (1969)) is defined by
a *universal* least-squares expansion of each Slater-type shell (1s, 2sp,
3sp, 4sp, 5sp, 3d, 4d) in three Gaussians, scaled per element by a Slater
exponent zeta:  alpha_i(element) = alpha_i(universal) * zeta**2, with the
contraction coefficients shared across elements.

Universal expansions below were regenerated from the published fitting
criterion (maximum overlap between the normalized Slater function and the
normalized 3-Gaussian contraction; see stong_fit.py) and verified against
the canonical tables for 1s, 2sp, 3sp and 4sp to 6+ significant digits
(e.g. H 1s: 3.42525091 = 2.227660584 * 1.24**2 with coefficients
0.15432897/0.53532814/0.44463454; Na 3sp: 1.4787406/0.4125649/0.1614751 =
universal * 1.75**2 with cs = -0.21962037/0.22559543/0.90039843).

Zeta provenance is per element:
  * 'canonical'      -- cross-verified against published STO-3G exponent
                        tables (all of periods 1-2 and Na/P/S/Cl).
  * 'interpolated'   -- 2-decimal values interpolated along the verified
                        period-3 trend lines.
  * 'reconstructed'  -- calibrated Slater-rule estimates (period 4-5);
                        functional and smooth, but NOT the published
                        values.  tools/import_basis.py can override them
                        from an NWChem-format basis file when available.

This replaces the reference's dependency on PySCF's built-in 'sto-3g'
tables (ref grid.py:45, dft.py:276).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Universal 3-Gaussian expansions: shell -> (alphas, {l: coeffs}).
# Coefficients apply to radially-normalized primitives; each contracted
# function is normalized to within fit accuracy (<1e-3) and is renormalized
# exactly at basis-build time (energies are invariant to AO scaling).
# ---------------------------------------------------------------------------
UNIVERSAL_FITS: dict[str, tuple[tuple[float, ...], dict[int, tuple[float, ...]]]] = {
    "1s": (
        (2.227660584, 0.405771156, 0.109818),
        {0: (0.154328967, 0.535328142, 0.444634542)},
    ),
    "2sp": (
        (0.994203, 0.231031, 0.0751386),
        {
            0: (-0.09996723, 0.39951283, 0.70011547),
            1: (0.15591627, 0.60768372, 0.39195739),
        },
    ),
    "3sp": (
        (0.48285408, 0.13471507, 0.05272657),
        {
            0: (-0.21962037, 0.22559543, 0.90039843),
            1: (0.01058760, 0.59516700, 0.46200101),
        },
    ),
    "4sp": (
        (0.24645606, 0.09095845, 0.04016817),
        {
            0: (-0.30884808, 0.01961556, 1.13102943),
            1: (-0.12154788, 0.57152655, 0.54989238),
        },
    ),
    "5sp": (
        (0.13490128, 0.07263608, 0.03208462),
        {
            0: (-0.38426498, -0.19725545, 1.37549494),
            1: (-0.34816999, 0.62903337, 0.66628313),
        },
    ),
    "3d": (
        (0.52291121, 0.16395959, 0.06386630),
        {2: (0.16865961, 0.58479846, 0.40567796)},
    ),
    "4d": (
        (0.17777165, 0.08040645, 0.03949855),
        {2: (0.23085549, 0.60424080, 0.25957679)},
    ),
}

# Shell sets per atomic-number range.
def shells_for_z(z: int) -> list[str]:
    if z <= 2:
        return ["1s"]
    if z <= 10:
        return ["1s", "2sp"]
    if z <= 18:
        return ["1s", "2sp", "3sp"]
    if z <= 20:
        return ["1s", "2sp", "3sp", "4sp"]
    if z <= 36:  # Sc-Kr carry a 3d shell in STO-3G
        return ["1s", "2sp", "3sp", "3d", "4sp"]
    if z <= 38:  # Rb, Sr
        return ["1s", "2sp", "3sp", "3d", "4sp", "5sp"]
    if z <= 54:  # Y-Xe carry a 4d shell
        return ["1s", "2sp", "3sp", "3d", "4sp", "4d", "5sp"]
    raise ValueError(f"STO-3G tables here stop at Z=54, got Z={z}")


# ---------------------------------------------------------------------------
# Slater exponents zeta per element/shell.  (zeta, provenance)
# ---------------------------------------------------------------------------
_C, _I, _R = "canonical", "interpolated", "reconstructed"

ZETA: dict[str, dict[str, tuple[float, str]]] = {
    "H":  {"1s": (1.24, _C)},
    "He": {"1s": (1.69, _C)},
    "Li": {"1s": (2.69, _C), "2sp": (0.80, _C)},
    "Be": {"1s": (3.68, _C), "2sp": (1.15, _C)},
    "B":  {"1s": (4.68, _C), "2sp": (1.50, _C)},
    "C":  {"1s": (5.67, _C), "2sp": (1.72, _C)},
    "N":  {"1s": (6.67, _C), "2sp": (1.95, _C)},
    "O":  {"1s": (7.66, _C), "2sp": (2.25, _C)},
    "F":  {"1s": (8.65, _C), "2sp": (2.55, _C)},
    "Ne": {"1s": (9.64, _C), "2sp": (2.88, _C)},
    "Na": {"1s": (10.61, _C), "2sp": (3.48, _C), "3sp": (1.75, _C)},
    "Mg": {"1s": (11.58, _I), "2sp": (3.92, _I), "3sp": (1.70, _I)},
    "Al": {"1s": (12.56, _I), "2sp": (4.36, _I), "3sp": (1.70, _I)},
    "Si": {"1s": (13.53, _I), "2sp": (4.83, _I), "3sp": (1.75, _I)},
    "P":  {"1s": (14.50, _C), "2sp": (5.31, _C), "3sp": (1.90, _I)},
    "S":  {"1s": (15.47, _C), "2sp": (5.79, _C), "3sp": (2.05, _C)},
    "Cl": {"1s": (16.43, _C), "2sp": (6.26, _C), "3sp": (2.10, _C)},
    "Ar": {"1s": (17.40, _I), "2sp": (6.74, _I), "3sp": (2.33, _I)},
}

# Period 4-5 zetas are reconstructed by calibrated Slater rules at import
# (see _reconstruct_heavy below); entries land in ZETA with provenance
# 'reconstructed'.

# Aufbau electron configurations for the Slater screening counts.
# Exceptions move one s electron into the d shell (Cr/Cu/Nb/Mo/Ru/Rh/Ag; Pd
# moves both).
_EXCEPTIONS = {"Cr": ("4s", "3d", 1), "Cu": ("4s", "3d", 1),
               "Nb": ("5s", "4d", 1), "Mo": ("5s", "4d", 1),
               "Ru": ("5s", "4d", 1), "Rh": ("5s", "4d", 1),
               "Pd": ("5s", "4d", 2), "Ag": ("5s", "4d", 1)}

_AUFBAU = ["1s", "2s", "2p", "3s", "3p", "4s", "3d", "4p", "5s", "4d", "5p"]
_CAP = {"s": 2, "p": 6, "d": 10}


def electron_config(symbol: str, z: int) -> dict[str, int]:
    cfg: dict[str, int] = {}
    rem = z
    for sub in _AUFBAU:
        take = min(_CAP[sub[-1]], rem)
        if take:
            cfg[sub] = take
        rem -= take
        if rem == 0:
            break
    if symbol in _EXCEPTIONS:
        src, dst, k = _EXCEPTIONS[symbol]
        if cfg.get(src, 0) >= k:
            cfg[src] -= k
            cfg[dst] = cfg.get(dst, 0) + k
    return cfg


def _slater_zeta(symbol: str, z: int, n: int, l: int) -> float:
    """Slater's rules effective exponent for subshell (n, l)."""
    cfg = electron_config(symbol, z)
    group = []  # subshells in the same Slater group
    if l <= 1:
        group = [f"{n}s", f"{n}p"]
    else:
        group = [f"{n}{'spdf'[l]}"]
    same = sum(cfg.get(g, 0) for g in group)
    sigma = 0.35 * max(same - 1, 0)
    if n == 1:
        sigma = 0.30 * max(same - 1, 0)
    for sub, occ in cfg.items():
        ns, ls = int(sub[0]), "spdf".index(sub[1])
        if sub in group:
            continue
        if l <= 1:
            if ns == n - 1:
                sigma += 0.85 * occ
            elif ns < n - 1:
                sigma += 1.00 * occ
            elif ns == n and ls >= 2:
                # d/f in same n screen s/p fully? Slater: same-n d counts in
                # lower groups for s/p -> 1.00 each (d is "inner" to sp)
                sigma += 0.0  # d electrons are *outside* in Slater ordering
        else:  # d shell: everything below screens fully, same group 0.35
            if (ns < n) or (ns == n and ls < l):
                sigma += 1.00 * occ
    nstar = {1: 1.0, 2: 2.0, 3: 3.0, 4: 3.7, 5: 4.0}[n]
    return max((z - sigma) / nstar, 0.30)


def _calibrate() -> dict[str, float]:
    """Per-shell ratio published/Slater averaged over the verified table."""
    from quantum_compute_dft_tpu.mol.elements import Z_OF

    ratios: dict[str, list[float]] = {"1s": [], "2sp": [], "3sp": []}
    for sym, shells in ZETA.items():
        z = Z_OF[sym]
        for shell, (zeta, prov) in shells.items():
            if prov != _C:
                continue
            n = int(shell[0])
            l = 0 if shell.endswith("s") or shell.endswith("sp") else 2
            sl = _slater_zeta(sym, z, n, l)
            ratios.setdefault(shell, []).append(zeta / sl)
    return {k: (sum(v) / len(v) if v else 1.0) for k, v in ratios.items()}


def _reconstruct_heavy() -> None:
    from quantum_compute_dft_tpu.mol.elements import SYMBOLS

    cal = _calibrate()
    # shells beyond period 3 reuse the outermost calibration factor
    fallback = cal.get("3sp", 1.0)
    for z in range(19, 55):
        sym = SYMBOLS[z]
        if sym in ZETA:
            continue
        entry: dict[str, tuple[float, str]] = {}
        for shell in shells_for_z(z):
            n = int(shell[0])
            l = 2 if shell.endswith("d") else 0
            factor = cal.get(shell, fallback)
            zeta = _slater_zeta(sym, z, n, l) * factor
            entry[shell] = (round(zeta, 4), _R)
        ZETA[sym] = entry


_reconstruct_heavy()


def element_shells(symbol: str) -> list[tuple[str, int, tuple[float, ...], tuple[float, ...]]]:
    """-> [(shell_name, l, alphas_scaled, coeffs), ...] for one element.

    If canonical tables were imported (tools/import_basis.py writes
    basis/sto3g_override.py), they take precedence over the generated
    zeta-scaled universal fits."""
    from quantum_compute_dft_tpu.mol.elements import Z_OF

    try:
        from quantum_compute_dft_tpu.basis.sto3g_override import SHELLS

        if symbol in SHELLS:
            return [
                (f"override(l={l})", l, tuple(a), tuple(c))
                for (l, a, c) in SHELLS[symbol]
            ]
    except ImportError:
        pass

    z = Z_OF[symbol]
    out = []
    for shell in shells_for_z(z):
        zeta, _prov = ZETA[symbol][shell]
        alphas, by_l = UNIVERSAL_FITS[shell]
        scaled = tuple(a * zeta * zeta for a in alphas)
        for l, coeffs in sorted(by_l.items()):
            out.append((shell, l, scaled, coeffs))
    return out
