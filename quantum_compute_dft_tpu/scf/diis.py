"""CDIIS (Pulay commutator DIIS) with a fixed-size jit-friendly history.

Native replacement for ``pyscf.scf.diis.CDIIS`` used by the reference
(ref dft.py:184,225).  Error vector e = X^T (F D S - S D F) X; the
extrapolation solves the bordered normal equations

    [ B   -1 ] [ c      ]   [ 0  ]
    [ -1'  0 ] [ lambda ] = [ -1 ]

with B_ij = <e_i, e_j>.  The history lives in fixed-shape buffers with
masking, so the whole update is a single jitted function usable inside
lax.while_loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DIISState(NamedTuple):
    f_buf: jnp.ndarray   # (M, nao, nao)
    e_buf: jnp.ndarray   # (M, nao*nao)
    nsaved: jnp.ndarray  # scalar int


def diis_init(nao: int, space: int = 8, dtype=jnp.float64) -> DIISState:
    return DIISState(
        f_buf=jnp.zeros((space, nao, nao), dtype),
        e_buf=jnp.zeros((space, nao * nao), dtype),
        nsaved=jnp.array(0, jnp.int32),
    )


@jax.jit
def diis_update(state: DIISState, f, dm, s, x):
    """Insert (F, error) and return the extrapolated Fock matrix."""
    m = state.f_buf.shape[0]
    sdf = s @ dm @ f
    err = x.T @ (f @ dm @ s - sdf) @ x
    slot = state.nsaved % m
    f_buf = state.f_buf.at[slot].set(f)
    e_buf = state.e_buf.at[slot].set(err.ravel())
    nsaved = state.nsaved + 1
    nused = jnp.minimum(nsaved, m)

    used = (jnp.arange(m) < nused).astype(f.dtype)
    b_inner = e_buf @ e_buf.T                           # (M, M)
    mask2 = used[:, None] * used[None, :]
    # unused slots -> identity rows/cols so the solve stays well posed
    b_inner = b_inner * mask2 + jnp.diag(1.0 - used)
    # ridge for near-linear-dependence
    b_inner = b_inner + 1e-14 * jnp.eye(m, dtype=f.dtype)

    b = jnp.zeros((m + 1, m + 1), f.dtype)
    b = b.at[:m, :m].set(b_inner)
    b = b.at[:m, m].set(-used)
    b = b.at[m, :m].set(-used)
    rhs = jnp.zeros(m + 1, f.dtype).at[m].set(-1.0)
    # symmetric pseudo-solve via eigh: TPU XLA has no f64 LU custom call,
    # and the thresholded inverse also guards near-singular DIIS systems
    w_eig, v_eig = jnp.linalg.eigh(b)
    inv = jnp.where(jnp.abs(w_eig) > 1e-14, 1.0 / w_eig, 0.0)
    coef = (v_eig @ (inv * (v_eig.T @ rhs)))[:m] * used

    f_ext = jnp.einsum("i,ijk->jk", coef, f_buf)
    # with a single stored matrix, extrapolation is the identity
    f_out = jnp.where(nused > 1, f_ext, f)
    return DIISState(f_buf, e_buf, nsaved), f_out
