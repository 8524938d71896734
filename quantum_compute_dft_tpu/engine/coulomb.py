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


def packed_coulomb_factory(pair_idx, w, nao: int):
    """J from the Schwarz-packed unique-pair ERI block W.

    pair_idx: (iu, ju) arrays of the surviving unique pairs (iu <= ju).
    W[a, b] = (i_a j_a | i_b j_b).  J_pair_a = sum_b W[a,b] D_jb,ib * mult_b
    with mult = 2 for off-diagonal pairs (kl + lk), 1 on the diagonal.
    """
    iu, ju = pair_idx
    iu = jnp.asarray(iu)
    ju = jnp.asarray(ju)
    mult = jnp.where(iu == ju, 1.0, 2.0)
    w = jnp.asarray(w)

    @jax.jit
    def coulomb(dm):
        d_pair = dm[iu, ju] * mult          # (npair,)
        j_pair = w @ d_pair                  # (npair,)
        j = jnp.zeros_like(dm)
        j = j.at[iu, ju].set(j_pair)
        j = j.at[ju, iu].set(j_pair)        # overwrite diag consistently
        return j

    return coulomb
