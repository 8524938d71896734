"""One-electron integrals: overlap S, kinetic T, nuclear attraction V.

Replaces the reference's PySCF calls ``mol.intor('int1e_ovlp'/'int1e_kin'/
'int1e_nuc')`` (ref grid.py:61-64) with a native McMurchie-Davidson
implementation, formulated as one uniform jit-compiled kernel vmapped over
cartesian AO pairs (static lmax, dynamic powers via gathers) -- no
per-shell-class dispatch, which is the XLA-friendly shape of the problem.
"""

from __future__ import annotations

import os
from math import pi

import jax
import jax.numpy as jnp
import numpy as np

from quantum_compute_dft_tpu.basis.basis_set import BasisSet
from quantum_compute_dft_tpu.integrals.boys import boys_fast as boys
from quantum_compute_dft_tpu.integrals.mcmurchie import e_tables, hermite_combos, r_tensor


def _pair_kernel(lmax: int):
    """Returns f(pa, pb, A, B, aa, ab, ca, cb, atom_xyz, atom_z) -> (S,T,V)
    for one AO pair (contracted over the NPRIM x NPRIM primitive grid)."""

    combos = hermite_combos(2 * lmax)

    def prim(pa, pb, A, B, a, b, atom_xyz, atom_z):
        p = a + b
        ab3 = A - B
        # E tables per dimension; jmax+2 for the kinetic ladder.
        Es = [e_tables(lmax, lmax + 2, a, b, ab3[d]) for d in range(3)]
        e0 = [Es[d][pa[d], pb[d], 0] for d in range(3)]

        pref = (pi / p) ** 1.5
        s_val = pref * e0[0] * e0[1] * e0[2]

        # kinetic: -1/2 d^2/dx^2 ladder per dimension
        d2 = []
        for d in range(3):
            j = pb[d]
            jm2 = Es[d][pa[d], jnp.maximum(j - 2, 0), 0]
            jp2 = Es[d][pa[d], j + 2, 0]
            j0 = e0[d]
            d2.append(
                j * (j - 1) * jm2 - 2.0 * b * (2 * j + 1) * j0 + 4.0 * b * b * jp2
            )
        t_val = -0.5 * pref * (
            d2[0] * e0[1] * e0[2] + e0[0] * d2[1] * e0[2] + e0[0] * e0[1] * d2[2]
        )

        # nuclear attraction over all atoms
        P = (a * A + b * B) / p
        ex = [Es[d][pa[d], pb[d], :] for d in range(3)]

        def one_atom(c_xyz, z):
            pc = P - c_xyz
            r2 = pc @ pc
            f = boys(2 * lmax, p * r2)
            r = r_tensor(2 * lmax, p, pc, f)
            acc = 0.0
            for (t, u, v) in combos:
                acc = acc + ex[0][t] * ex[1][u] * ex[2][v] * r[(t, u, v)]
            return -z * acc

        v_val = (2.0 * pi / p) * jnp.sum(
            jax.vmap(one_atom)(atom_xyz, atom_z)
        )
        return s_val, t_val, v_val

    def pair(pa, pb, A, B, aa, ab, ca, cb, atom_xyz, atom_z):
        nprim = aa.shape[0]
        a_grid = jnp.repeat(aa, nprim)
        b_grid = jnp.tile(ab, nprim)
        w_grid = jnp.repeat(ca, nprim) * jnp.tile(cb, nprim)
        s, t, v = jax.vmap(
            lambda a, b: prim(pa, pb, A, B, a, b, atom_xyz, atom_z)
        )(a_grid, b_grid)
        return w_grid @ s, w_grid @ t, w_grid @ v

    return pair


import functools


@functools.lru_cache(maxsize=None)
def _pair_runner(lmax: int):
    """Module-cached jitted pair sweep: arrays are ARGUMENTS (not
    closures), so same-shape calls (zeta trials, warm reruns) reuse one
    compiled program instead of re-tracing per invocation."""
    kern = _pair_kernel(lmax)

    @jax.jit
    def run(pw, ce, al, co, axyz, az, ii, jj):
        return jax.vmap(
            lambda i, j: kern(
                pw[i], pw[j], ce[i], ce[j], al[i], al[j], co[i], co[j], axyz, az
            )
        )(ii, jj)

    return run


# Row budget for the fused nuclear-attraction intermediate.  The V sweep
# materializes a Boys-table buffer of (npairs * nprim^2 * natom) rows whose
# ~10-wide minor dim the TPU tiled layout pads to 128 lanes; at the
# 117-atom north star (71,253 pairs x 9 prim-pairs x 117 atoms = 75.0M
# rows) the unchunked program asks for a 38 GB buffer on a 16 GB chip.
# 2M fused rows bounds that temporary near ~1 GB while keeping each
# dispatch VPU-saturating.  The per-dispatch PAIR chunk is derived from
# this budget and the molecule's natom/nprim, so small molecules stay
# single-dispatch.
_ROW_BUDGET = int(os.environ.get("DFT_INT1E_ROWS", str(1 << 21)))


def _pair_chunk(natom: int, nprim: int) -> int:
    expand = max(1, natom * nprim * nprim)
    return max(1024, _ROW_BUDGET // expand)


def one_electron_cart(basis: BasisSet, atom_xyz: np.ndarray, atom_z: np.ndarray):
    """S, T, V in the cartesian AO basis, computed pairwise on device."""
    n = basis.ncart
    lmax = int(basis.cart_powers.max())
    iu, ju = np.triu_indices(n)

    pw = jnp.asarray(basis.cart_powers)
    ce = jnp.asarray(basis.cart_centers)
    al = jnp.asarray(basis.cart_alphas)
    co = jnp.asarray(basis.cart_coeffs)
    axyz = jnp.asarray(atom_xyz)
    az = jnp.asarray(atom_z)

    run = _pair_runner(lmax)
    npairs = iu.size
    chunk = _pair_chunk(len(atom_z), int(basis.cart_alphas.shape[1]))
    if npairs <= chunk:
        s_u, t_u, v_u = run(
            pw, ce, al, co, axyz, az, jnp.asarray(iu), jnp.asarray(ju)
        )
    else:
        # fixed-shape chunks (last one padded with pair (0,0), trimmed
        # after fetch) -> one compiled program reused across all chunks
        parts = []
        for k in range(0, npairs, chunk):
            ii = iu[k:k + chunk]
            jj = ju[k:k + chunk]
            real = ii.size
            if real < chunk:
                pad = chunk - real
                ii = np.concatenate([ii, np.zeros(pad, ii.dtype)])
                jj = np.concatenate([jj, np.zeros(pad, jj.dtype)])
            s_c, t_c, v_c = run(
                pw, ce, al, co, axyz, az, jnp.asarray(ii), jnp.asarray(jj)
            )
            parts.append((np.asarray(s_c)[:real], np.asarray(t_c)[:real],
                          np.asarray(v_c)[:real]))
        s_u = np.concatenate([p[0] for p in parts])
        t_u = np.concatenate([p[1] for p in parts])
        v_u = np.concatenate([p[2] for p in parts])

    def unpack(vals):
        m = np.zeros((n, n))
        m[iu, ju] = np.asarray(vals)
        m[ju, iu] = np.asarray(vals)
        return m

    return unpack(s_u), unpack(t_u), unpack(v_u)


def one_electron(basis: BasisSet, atom_xyz: np.ndarray, atom_z: np.ndarray):
    """S, T, V in the spherical AO basis (matches ref grid.py:61-64)."""
    s, t, v = one_electron_cart(basis, atom_xyz, atom_z)
    c = basis.c2s
    return c @ s @ c.T, c @ t @ c.T, c @ v @ c.T
