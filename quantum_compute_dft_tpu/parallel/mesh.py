"""Device mesh helpers.

The reference is strictly single-GPU (SURVEY.md section 2.4); the TPU
framework scales by sharding the quadrature grid -- the "data"/"sequence"
axis of DFT (ngrid >> nao) -- across chips, with per-shard E_xc/V_xc/J/K
contributions combined by psum over ICI.  Single chip is the mesh-of-1
special case: no separate code path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRID_AXIS = "grid"


def grid_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (GRID_AXIS,))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int):
    """Zero-pad `axis` so its size divides `multiple` (zero quadrature
    weights make padding exact, not approximate)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, rem)
    return np.pad(arr, widths)


def shard_grid_arrays(mesh: Mesh, ao, weights, ao_grad=None):
    """Place grid-axis arrays with NamedShardings: ao (ngrid, nao) on
    P(grid, None), weights (ngrid,) on P(grid), ao_grad (3, ngrid, nao) on
    P(None, grid, None)."""
    nd = mesh.devices.size
    ao = pad_to_multiple(np.asarray(ao), nd, 0)
    weights = pad_to_multiple(np.asarray(weights), nd, 0)
    ao_s = jax.device_put(ao, NamedSharding(mesh, P(GRID_AXIS, None)))
    w_s = jax.device_put(weights, NamedSharding(mesh, P(GRID_AXIS)))
    if ao_grad is None:
        return ao_s, w_s, None
    ao_grad = pad_to_multiple(np.asarray(ao_grad), nd, 1)
    g_s = jax.device_put(ao_grad, NamedSharding(mesh, P(None, GRID_AXIS, None)))
    return ao_s, w_s, g_s
