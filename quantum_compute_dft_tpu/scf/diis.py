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
    b_inner = b_inner * mask2

    # Solve min c^T B c subject to sum(c) = 1 via the truncated
    # pseudo-inverse: c = B+ 1 / (1^T B+ 1).  B is scaled to unit norm and
    # eigendirections below a *relative* threshold are dropped -- with the
    # f32-quality TPU eigh, directions below ~1e-8 ||B|| are numerical
    # noise, and extrapolating along them is what blows DIIS up (no
    # iterative refinement: with an approximate inverse and cond(B) ~ 1e10
    # refinement diverges).  Falls back to the newest Fock matrix when the
    # projected constraint direction degenerates.
    scale = jnp.max(jnp.diagonal(b_inner)) + 1e-300
    b_s = b_inner / scale + jnp.diag(1.0 - used)
    w_eig, v_eig = jnp.linalg.eigh(b_s)
    # relative TSVD threshold: CPU eigh is f64-exact so deep extrapolation
    # is trustworthy (faster convergence); TPU eigh is f32-quality
    thresh = 1e-13 if jax.default_backend() == "cpu" else 1e-8
    inv = jnp.where(jnp.abs(w_eig) > thresh, 1.0 / w_eig, 0.0)
    ones = used
    u = v_eig @ (inv * (v_eig.T @ ones))
    denom = ones @ u
    slot_new = (nsaved - 1) % m
    newest = jnp.zeros(m, f.dtype).at[slot_new].set(1.0)
    coef = jnp.where(jnp.abs(denom) > 1e-8, u / jnp.where(
        jnp.abs(denom) > 1e-8, denom, 1.0), newest) * used
    # distrust wild extrapolations (another ill-conditioning symptom)
    coef = jnp.where(jnp.sum(jnp.abs(coef)) < 20.0, coef, newest)

    f_ext = jnp.einsum("i,ijk->jk", coef, f_buf)
    # with a single stored matrix, extrapolation is the identity
    f_out = jnp.where(nused > 1, f_ext, f)
    return DIISState(f_buf, e_buf, nsaved), f_out
