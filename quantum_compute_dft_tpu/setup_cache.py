"""Disk cache for per-molecule setup artifacts.

The reference pays seconds of libcint per run (ref grid.py:61-66); the
native McMurchie-Davidson build pays a large *first-shape* remote-TPU
compile instead (minutes at DHA scale even with the persistent compile
cache, which only removes the XLA-compile part, not tracing/lowering).
Since the artifacts themselves -- S/T/V, the pivoted-Cholesky ERI
vectors, the molecular grid -- are pure functions of (geometry, basis
tables, tolerances), we memoize the RESULTS on disk: a warm run of the
same molecule loads megabytes instead of re-deriving them.

Keyed by a sha256 over the exact float64 geometry bytes, charges, the
basis-table contents (so imported/updated basis data invalidates), and
the artifact parameters.  Disable with DFT_SETUP_CACHE=0; cache dir
overridable with DFT_SETUP_CACHE_DIR (default <repo>/.cache/setup).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np


def _cache_dir() -> str | None:
    if os.environ.get("DFT_SETUP_CACHE", "1") == "0":
        return None
    d = os.environ.get("DFT_SETUP_CACHE_DIR")
    if not d:
        d = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".cache", "setup",
        )
    os.makedirs(d, exist_ok=True)
    return d


def molecule_basis_key(mol, basis) -> str:
    """Hash of everything the integral artifacts depend on."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(mol.coords, dtype=np.float64).tobytes())
    h.update(np.ascontiguousarray(mol.charges, dtype=np.float64).tobytes())
    # basis tables content (catches canonical-data imports / edits)
    for arr in (basis.cart_powers, basis.cart_alphas, basis.cart_coeffs,
                basis.cart_centers, basis.c2s):
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:24]


def load(kind: str, key: str, names: tuple[str, ...]):
    """-> tuple of arrays or None on miss."""
    d = _cache_dir()
    if d is None:
        return None
    path = os.path.join(d, f"{kind}_{key}.npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return tuple(z[n] for n in names)
    except Exception:
        return None


def store(kind: str, key: str, **arrays) -> None:
    d = _cache_dir()
    if d is None:
        return
    path = os.path.join(d, f"{kind}_{key}.npz")
    # np.savez appends '.npz' when the name lacks it -- make the tmp name
    # explicit so the atomic rename actually finds the file it wrote
    tmp = path + ".tmp.npz"
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
