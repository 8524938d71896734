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


# ---------------------------------------------------------------------------
# ADIIS (Hu & Yang, JCP 132, 054109 (2010)): energy-based DIIS for the
# far-from-convergence phase.  CDIIS extrapolates the Fock COMMUTATOR,
# which happily mixes iterates from different electronic configurations
# -- on near-degenerate systems (CuO's open d/pi manifold) that produces
# a permanent charge-slosh limit cycle.  ADIIS instead minimizes a
# quadratic model of the ENERGY over the convex hull of the stored
# iterates:  E(c) ~ 2 sum_i c_i <D_i - D_n, F_n>
#                   + sum_ij c_i c_j <D_i - D_n, F_j - F_n>,
# c on the simplex -- mixing can only move downhill in the model, which
# breaks configuration sloshing.  Used while ||FDS-SDF|| is large, then
# handed over to CDIIS for the quadratic endgame (scf.driver.scf_host).
# The simplex problem is tiny (M <= 8); it is solved inside jit by
# projected softmax gradient descent.
# ---------------------------------------------------------------------------


class ADIISState(NamedTuple):
    f_buf: jnp.ndarray   # (M, nao, nao)
    d_buf: jnp.ndarray   # (M, nao, nao)
    nsaved: jnp.ndarray  # scalar int


def adiis_init(nao: int, space: int = 8, dtype=jnp.float64) -> ADIISState:
    return ADIISState(
        f_buf=jnp.zeros((space, nao, nao), dtype),
        d_buf=jnp.zeros((space, nao, nao), dtype),
        nsaved=jnp.array(0, jnp.int32),
    )


@jax.jit
def adiis_update(state: ADIISState, f, dm):
    """Insert (F, D) and return the ADIIS-mixed Fock matrix."""
    m = state.f_buf.shape[0]
    slot = state.nsaved % m
    f_buf = state.f_buf.at[slot].set(f)
    d_buf = state.d_buf.at[slot].set(dm)
    nsaved = state.nsaved + 1
    nused = jnp.minimum(nsaved, m)
    used = (jnp.arange(m) < nused).astype(f.dtype)
    newest = (nsaved - 1) % m

    d_n = d_buf[newest]
    f_n = f_buf[newest]
    dd = d_buf - d_n[None]
    df = f_buf - f_n[None]
    g = jnp.einsum("ijk,jk->i", dd, f_n)             # <D_i - D_n, F_n>
    h = jnp.einsum("ijk,ljk->il", dd, df)            # <D_i - D_n, F_l - F_n>
    h = 0.5 * (h + h.T)
    scale = jnp.max(jnp.abs(h)) + jnp.max(jnp.abs(g)) + 1e-300

    neg = -1e30 * (1.0 - used)  # unused slots get zero softmax weight

    def model(t):
        c = jax.nn.softmax(t + neg)
        return (2.0 * (c @ g) + c @ (h @ c)) / scale

    grad = jax.grad(model)

    def gd(_, t):
        return t - 0.2 * grad(t)

    t0 = 4.0 * jnp.zeros(m, f.dtype).at[newest].set(1.0)
    t = jax.lax.fori_loop(0, 300, gd, t0)
    c = jax.nn.softmax(t + neg)
    f_mix = jnp.einsum("i,ijk->jk", c, f_buf)
    f_out = jnp.where(nused > 1, f_mix, f)
    return ADIISState(f_buf, d_buf, nsaved), f_out
