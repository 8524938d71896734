"""Pivoted Cholesky decomposition of the two-electron integral matrix.

The rigorous scalable Fock-build path (Beebe-Linderberg / Koch-style
"Cholesky DF"): the ERI matrix over unique AO pairs, W[(ij),(kl)] =
(ij|kl), is symmetric positive semi-definite, so a pivoted Cholesky
factorization W ~= L L^T truncated at residual-diagonal threshold `tol`
guarantees

    |(ij|kl) - sum_r L[ij,r] L[kl,r]|  <=  sqrt(d_ij d_kl)  <=  tol

element-wise -- an a-priori error bound no atom-centered auxiliary basis
can offer (the even-tempered RI sets in density_fitting.py saturate at
~1e-5 Eh on ring systems and their fitting metric turns ill-conditioned
as the set grows; the Cholesky vectors have no metric at all).

Replaces the reference's in-core (nao^2, nao^2) dgemv operand
(ref src/dft_solver.cu:550-555, built at ref grid.py:65) with a rank
~5-8x nao factor computed by BLOCKED pivot panels: each outer iteration
picks the `block` largest residual diagonals, evaluates their ERI
columns with the same McMurchie-Davidson quartet kernel used for the
in-core path (batched fixed-shape dispatches -- TPU-compile friendly),
and downdates on the host in exact f64.  Total integral work is
O(npair * rank) quartets instead of O(npair^2).

The resulting L unpacks to a (nao, nao, rank) tensor that drops into the
existing DF J/K builders with an IDENTITY fitting metric:

    J = sum_r L[:,:,r] (L[:,:,r] . D),    K = sum_r L_r D L_r^T.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from quantum_compute_dft_tpu.basis.basis_set import BasisSet, NPRIM
from quantum_compute_dft_tpu.integrals.two_electron import (
    _block_runner,
    _diag_runner,
    _pairs_runner,
)


def cholesky_eri_vectors(
    basis: BasisSet,
    tol: float = 1e-7,
    block: int | None = None,
    max_rank: int | None = None,
    verbose: bool = False,
):
    """-> L (nao, nao, rank) spherical-AO Cholesky vectors with
    max residual diagonal < tol (guaranteed elementwise ERI error)."""
    n = basis.ncart
    lmax = int(basis.cart_powers.max())
    if block is None:
        # TPU materializes the vmapped per-quartet intermediates in HBM:
        # measured 23.5 GB at block=256 for an s/p molecule (OOM on the
        # 16 GB v5e), so 128 stays the device default; the single-core
        # CPU fuses better and takes 256
        block = 256 if jax.default_backend() == "cpu" else 128
    iu, ju = np.triu_indices(n)
    npair = len(iu)

    pw = jnp.asarray(basis.cart_powers)
    ce = jnp.asarray(basis.cart_centers)
    al, co = basis.cart_alphas, basis.cart_coeffs
    a_grid = jnp.asarray(np.repeat(al[iu], NPRIM, axis=1))
    b_grid = jnp.asarray(np.tile(al[ju], (1, NPRIM)))
    cw = jnp.asarray(np.repeat(co[iu], NPRIM, axis=1) * np.tile(co[ju], (1, NPRIM)))

    p_all, P_all, et_all = _pairs_runner(lmax)(
        pw, ce, jnp.asarray(iu), jnp.asarray(ju), a_grid, b_grid
    )

    run_block = _block_runner(2 * lmax)
    run_diag = _diag_runner(2 * lmax)

    def padded(arrs, m, fill_first=True):
        n_ = arrs[0].shape[0]
        r = (-n_) % m
        out = [jnp.pad(a, [(0, r)] + [(0, 0)] * (a.ndim - 1)) for a in arrs]
        if fill_first and r:
            out[0] = out[0].at[n_:].set(1.0)  # positive exponent-sum slots
        return out

    # residual diagonal d_ab = (ab|ab) over ALL pairs (cheap: one quartet
    # per pair)
    p_d, P_d, et_d, cw_d = padded([p_all, P_all, et_all, cw], block)
    d_parts = [
        run_diag(*(a[s * block:(s + 1) * block]
                   for a in (p_d, P_d, et_d, cw_d)))
        for s in range(p_d.shape[0] // block)
    ]  # enqueue all, then materialize (see run_panel)
    d_full = np.concatenate([np.asarray(o) for o in d_parts])[:npair]
    d_full = np.maximum(d_full, 0.0)

    # Schwarz screening: |(ab|cd)| <= sqrt(d_ab d_cd) <= sqrt(d_ab d_max),
    # so pairs with d_ab <= tol^2 / d_max contribute < tol to every ERI
    # element and are dropped from the factorization outright (their L
    # rows are exactly zero).  On spatially extended systems (the
    # 117-atom north star) this removes the majority of the O(natom^2)
    # distant pairs -- the decisive cost lever for the panel builds.
    dmax = d_full.max() if npair else 0.0
    keep = d_full > (tol * tol) / max(dmax, 1e-300)
    sel = np.nonzero(keep)[0]
    iu, ju = iu[sel], ju[sel]
    d = d_full[sel]
    npair = len(sel)
    sel_j = jnp.asarray(sel)
    p_s, P_s, et_s, cw_s = padded(
        [p_all[sel_j], P_all[sel_j], et_all[sel_j], cw[sel_j]], block
    )
    npad = p_s.shape[0]
    nblk = npad // block
    if verbose:
        print(f"  cholesky: {npair}/{len(d_full)} pairs survive Schwarz "
              f"screening at tol={tol:g}")

    if max_rank is None:
        max_rank = min(npair, 16 * basis.nao + 64)

    def run_panel(pb, Pb, eb, cb):
        """ERI columns W[:, piv] for one pivot block -> (npad, k) numpy.

        One fixed-shape `run_block` dispatch per row block -- NOT one
        fused jit over all row blocks: at north-star scale that graph
        would inline ~280 quartet blocks and the remote TPU compiler is
        superlinear in graph size.  All row blocks are ENQUEUED first and
        materialized after: each np.asarray costs a full host<->device
        round-trip (~33 ms over the TPU tunnel), so serializing them
        added ~40 s/panel of pure latency at DHA scale."""
        outs = [
            run_block(
                p_s[s * block:(s + 1) * block],
                P_s[s * block:(s + 1) * block],
                et_s[s * block:(s + 1) * block],
                cw_s[s * block:(s + 1) * block],
                pb, Pb, eb, cb,
            )
            for s in range(nblk)
        ]
        return np.concatenate([np.asarray(o) for o in outs], axis=0)

    l_cols: list[np.ndarray] = []
    it = 0
    while True:
        dmax = d.max()
        if dmax < tol or len(l_cols) >= max_rank:
            break
        # pivot block: the `block` largest residual diagonals (pad by
        # repeating the first pivot; duplicate columns self-reject in the
        # panel factorization below)
        cand = np.argsort(-d)[:block]
        cand = cand[d[cand] > tol]
        k = len(cand)
        piv = np.concatenate([cand, np.repeat(cand[:1], block - k)])
        pj = jnp.asarray(piv)
        panel = np.array(run_panel(p_s[pj], P_s[pj], et_s[pj], cw_s[pj]))
        panel = panel[:npair, :k]
        if l_cols:
            lmat = np.concatenate(l_cols, axis=1)
            panel -= lmat @ lmat[piv[:k]].T
        # in-panel pivoted factorization (host, exact f64)
        for c in range(k):
            if len(l_cols) >= max_rank:
                break
            djj = panel[piv[c], c]
            if djj < tol:
                continue  # downdated below threshold by earlier columns
            lcol = panel[:, c] / np.sqrt(djj)
            l_cols.append(lcol[:, None])
            if c + 1 < k:
                panel[:, c + 1:] -= lcol[:, None] * lcol[piv[c + 1:k]][None, :]
            d -= lcol * lcol
        d = np.maximum(d, 0.0)
        it += 1
        if verbose:
            print(f"  cholesky panel {it}: rank={len(l_cols)}, "
                  f"max residual diag={d.max():.3e}")

    rank = len(l_cols)
    l_pair = (np.concatenate(l_cols, axis=1) if rank
              else np.zeros((npair, 0)))

    # unpack (pair, rank) -> symmetric (ncart, ncart, rank) -> spherical
    full = np.zeros((n, n, rank))
    full[iu, ju] = l_pair
    full[ju, iu] = l_pair
    c2s = basis.c2s
    if not (c2s.shape[0] == n and np.allclose(c2s, np.eye(n))):
        full = np.einsum("ip,jq,pqr->ijr", c2s, c2s, full, optimize=True)
    return full
