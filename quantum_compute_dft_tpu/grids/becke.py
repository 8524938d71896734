"""Becke partition weights (Becke, JCP 88, 2547 (1988)) in JAX.

Vectorized over grid points on device: O(ngrid * natm^2) elementwise work,
ideal for the VPU; replaces PySCF's gen_grid partitioning used by the
reference (ref grid.py:33-39).  Uses the Appendix atomic-size adjustment
with Bragg-Slater radii.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _stepfun(mu: jnp.ndarray) -> jnp.ndarray:
    """Becke's thrice-iterated smoothing polynomial -> s(mu) in [0, 1]."""
    p = mu
    for _ in range(3):
        p = 0.5 * p * (3.0 - p * p)
    return 0.5 * (1.0 - p)


def becke_weights(
    coords: jnp.ndarray,    # (ngrid, 3) grid points
    atom_xyz: jnp.ndarray,  # (natm, 3)
    atom_idx: jnp.ndarray,  # (ngrid,) owning atom of each point
    radii: jnp.ndarray,     # (natm,) Bragg radii (bohr)
) -> jnp.ndarray:
    """Partition weight of each point w.r.t. its owning atom."""
    natm = atom_xyz.shape[0]
    # distances point -> every atom: (ngrid, natm)
    d = jnp.linalg.norm(coords[:, None, :] - atom_xyz[None, :, :], axis=-1)
    # interatomic distances (natm, natm)
    rab = jnp.linalg.norm(atom_xyz[:, None, :] - atom_xyz[None, :, :], axis=-1)
    rab = jnp.where(jnp.eye(natm, dtype=bool), 1.0, rab)

    # size-adjustment parameter a_ij from Bragg radii (Becke appendix)
    chi = radii[:, None] / radii[None, :]
    u = (chi - 1.0) / (chi + 1.0)
    a = u / (u * u - 1.0)
    a = jnp.clip(a, -0.5, 0.5)

    # mu_ij per point: (ngrid, natm, natm)
    mu = (d[:, :, None] - d[:, None, :]) / rab[None, :, :]
    nu = mu + a[None, :, :] * (1.0 - mu * mu)
    s = _stepfun(nu)
    # exclude the diagonal from the product
    s = jnp.where(jnp.eye(natm, dtype=bool)[None, :, :], 1.0, s)
    p_cell = jnp.prod(s, axis=2)          # (ngrid, natm): P_i(r)
    w_own = jnp.take_along_axis(p_cell, atom_idx[:, None], axis=1)[:, 0]
    return w_own / jnp.sum(p_cell, axis=1)


becke_weights_jit = jax.jit(becke_weights)


def becke_weights_chunked(coords, atom_xyz, atom_idx, radii, chunk=65536):
    """Host-driven chunking for very large grids (bounds the (ngrid, natm^2)
    intermediate)."""
    n = coords.shape[0]
    out = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        out.append(
            np.asarray(
                becke_weights_jit(
                    jnp.asarray(coords[s:e]),
                    jnp.asarray(atom_xyz),
                    jnp.asarray(atom_idx[s:e]),
                    jnp.asarray(radii),
                )
            )
        )
    return np.concatenate(out)
