"""Density-fitted ERIs: auto-generated auxiliary basis, 3-center/2-center
integrals, and DF J/K builders.

The scalable path for large molecules where the in-core (nao^4) ERI tensor
(ref grid.py:65) no longer fits: J and hybrid K build from batched einsums
over (munu|P) -- the BASELINE.json north-star formulation.  The reference
has no equivalent (it is strictly in-core).

Implementation notes:
  * The auxiliary basis is an even-tempered set generated per element from
    the orbital basis: exponents spanning [2 a_min, 2 a_max] geometrically
    (ratio 2.5) for l = 0..2*l_occ -- the standard automatic auxiliary
    construction.
  * 3-center (munu|P) and 2-center (P|Q) integrals REUSE the 4-center
    McMurchie-Davidson quartet kernel with a zero-exponent dummy primitive
    as the second ket function: exp(-0 r^2) = 1 turns (munu|P sdummy)
    into (munu|P) exactly.
  * V^(-1/2) is built with eigh + Newton-Schulz polish (TPU-safe), so
    B = (munu|P) V^(-1/2) gives J = B (B . D) and
    K = sum_Q B_Q D B_Q^T as pure GEMMs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from quantum_compute_dft_tpu.basis.basis_set import (
    BasisSet,
    CART_MONOMIALS,
    NPRIM,
    cart_prim_norm,
)
from quantum_compute_dft_tpu.basis.data import element_shells
from quantum_compute_dft_tpu.integrals.two_electron import _pair_stage, _quartet_kernel
from quantum_compute_dft_tpu.mol.molecule import Molecule


# Named auxiliary-basis accuracy tiers (measured on H2O B3LYP DF-SCF vs
# in-core, grid level 1):
#   'tight': |dE| ~ 6e-8 Eh on H2O (g functions on p-block atoms, graded
#            taper, lindep 1e-9) -- but error grows with system size
#            (~1e-5 on benzene) and the metric turns ill-conditioned, so
#            the guaranteed-accuracy path is integrals/cholesky.py, NOT a
#            bigger even-tempered set.
#   'fast':  |dE| ~ 2e-5 Eh at ~40% of the aux size / 3c-build cost.
AUX_LEVELS = {
    "tight": dict(beta=1.6, taper=2, l_extra=3),
    "fast": dict(beta=2.0, taper=2, l_extra=2),
}


def autoaux_exponents(mol: Molecule, beta: float = 2.0, lo_f: float = 1.6,
                      hi_f: float = 2.2, taper: int = 2, l_extra: int = 2):
    """Even-tempered auxiliary exponents per element: spans the products of
    orbital-basis primitives.  -> {symbol: [(l, alpha), ...]}

    beta: geometric ratio; lo_f/hi_f: span [lo_f*amin, hi_f*amax] over the
    orbital primitives; taper: tight exponents dropped per l beyond l_occ;
    l_extra: angular momenta past l_occ (captures off-center bond-density
    products that atom-centered lower-l sets fit poorly)."""
    out = {}
    for sym in set(mol.symbols):
        shells = element_shells(sym)
        l_occ = max(s[1] for s in shells)
        amin = min(min(s[2]) for s in shells)
        amax = max(max(s[2]) for s in shells)
        lo, hi = lo_f * amin, hi_f * amax
        n = max(int(np.ceil(np.log(hi / lo) / np.log(beta))) + 1, 2)
        exps = lo * beta ** np.arange(n)
        funcs = []
        for l in range(min(l_occ + l_extra + 1, 5)):
            # graded taper: each l beyond l_occ drops `taper` more of the
            # tightest exponents (high-l fit functions matter most in the
            # valence/bond region, not at the core cusp)
            sel = exps if l <= l_occ else exps[: max(n - taper * (l - l_occ), 1)]
            funcs.extend((l, float(a)) for a in sel)
        out[sym] = funcs
    return out


def build_aux_cart_table(mol: Molecule, beta: float = 2.0, **aux_kw):
    """Cartesian aux-function table (one normalized primitive each):
    -> (powers (naux_cart,3), alphas (naux_cart,), coeffs, centers, c2s_aux)."""
    from quantum_compute_dft_tpu.basis.basis_set import SPH_FROM_CART
    from math import pi, sqrt

    table = autoaux_exponents(mol, beta, **aux_kw)
    powers, alphas, coeffs, centers = [], [], [], []
    sph_blocks = []
    for ia, sym in enumerate(mol.symbols):
        for l, a in table[sym]:
            fold = sqrt(1.0 / (4.0 * pi)) if l == 0 else (
                sqrt(3.0 / (4.0 * pi)) if l == 1 else 1.0
            )
            for lx, ly, lz in CART_MONOMIALS[l]:
                powers.append((lx, ly, lz))
                alphas.append(a)
                # radially-normalized primitive, with the s/p solid-harmonic
                # scalar folded in (mirrors build_basis)
                from quantum_compute_dft_tpu.basis.basis_set import radial_gto_norm

                coeffs.append(fold * radial_gto_norm(l, a))
                centers.append(mol.coords[ia])
            sph_blocks.append(
                np.eye(2 * l + 1) if l <= 1 else SPH_FROM_CART[l]
            )
    ncart = len(powers)
    nsph = sum(b.shape[0] for b in sph_blocks)
    c2s = np.zeros((nsph, ncart))
    io = jo = 0
    for b in sph_blocks:
        ns, nc = b.shape
        c2s[io : io + ns, jo : jo + nc] = b
        io += ns
        jo += nc
    return (
        np.array(powers, dtype=np.int32),
        np.array(alphas),
        np.array(coeffs),
        np.array(centers),
        c2s,
    )


def _aux_pair_data(l_aux: int, powers, alphas, coeffs, centers):
    """Hermite pair data for (aux, dummy) pairs -- one primitive slot (the
    quartet kernel broadcasts over asymmetric primitive counts)."""
    pair_fn, combos = _pair_stage(l_aux, 0)
    naux = len(alphas)

    pw = jnp.asarray(powers)
    al = jnp.asarray(alphas)
    ce = jnp.asarray(centers)
    zero_pow = jnp.zeros(3, jnp.int32)

    @jax.jit
    def run(i):
        p, P, et = pair_fn(pw[i], zero_pow, ce[i], ce[i], al[i], jnp.asarray(0.0))
        return p, P, et

    ps, Ps, ets = jax.vmap(run)(jnp.arange(naux))
    return (
        ps[:, None],                 # (naux, 1)
        Ps[:, None, :],              # (naux, 1, 3)
        ets[:, None, :],             # (naux, 1, nc)
        jnp.asarray(coeffs)[:, None],
    )


def df_tensors(basis: BasisSet, mol: Molecule, screen_tol: float = 1e-12,
               block: int | None = None, aux_level: str = "tight", **aux_kw):
    """-> (j3c (nao, nao, naux_sph), v2c (naux_sph, naux_sph)).

    aux_level selects a named accuracy tier from AUX_LEVELS; individual
    generator knobs (beta/taper/l_extra/lo_f/hi_f) can be overridden via
    aux_kw."""
    aux_kw = {**AUX_LEVELS[aux_level], **aux_kw}
    from quantum_compute_dft_tpu.integrals.two_electron import eri_packed  # noqa: F401
    from quantum_compute_dft_tpu.basis.basis_set import NPRIM as _NP

    lmax_ao = int(basis.cart_powers.max())
    apow, aalpha, acoef, acent, ac2s = build_aux_cart_table(mol, **aux_kw)
    l_aux = int(apow.sum(axis=1).max())
    if block is None:
        # TPU materializes the vmapped per-quartet intermediates in HBM;
        # keep blocks modest there (the single-core CPU fuses better)
        block = 256 if jax.default_backend() == "cpu" else 128

    # --- AO pair stage (same as eri_packed's) ---
    n = basis.ncart
    iu, ju = np.triu_indices(n)
    pair_fn, combos = _pair_stage(lmax_ao)
    pw = jnp.asarray(basis.cart_powers)
    ce = jnp.asarray(basis.cart_centers)
    al, co = basis.cart_alphas, basis.cart_coeffs
    a_grid = jnp.asarray(np.repeat(al[iu], _NP, axis=1))
    b_grid = jnp.asarray(np.tile(al[ju], (1, _NP)))
    cw = jnp.asarray(np.repeat(co[iu], _NP, axis=1) * np.tile(co[ju], (1, _NP)))

    @jax.jit
    def run_pairs(ii, jj, ag, bg):
        def one(i, j, a9, b9):
            return jax.vmap(
                lambda a, b: pair_fn(pw[i], pw[j], ce[i], ce[j], a, b)
            )(a9, b9)
        return jax.vmap(one)(ii, jj, ag, bg)

    p_ao, P_ao, et_ao = run_pairs(jnp.asarray(iu), jnp.asarray(ju), a_grid, b_grid)

    # --- aux pair stage ---
    p_ax, P_ax, et_ax, cw_ax = _aux_pair_data(l_aux, apow, aalpha, acoef, acent)
    naux_c = len(aalpha)

    quartet = _quartet_kernel(2 * lmax_ao, l_aux)
    quartet_aux = _quartet_kernel(l_aux, l_aux)

    def make_run(q):
        @jax.jit
        def run_block(pa, Pa, ea, ca, pb, Pb, eb, cb):
            return jax.vmap(
                lambda p1, P1, e1, c1: jax.vmap(
                    lambda p2, P2, e2, c2: q(p1, P1, e1, c1, p2, P2, e2, c2)
                )(pb, Pb, eb, cb)
            )(pa, Pa, ea, ca)
        return run_block

    run_3c = make_run(quartet)
    run_2c = make_run(quartet_aux)

    def pad_rows(arrs, m):
        """zero-weight-pad the pair arrays to a multiple of block so every
        dispatched block has ONE shape (each distinct shape costs a remote
        TPU compile of 1-2 minutes)."""
        n_ = arrs[0].shape[0]
        r = (-n_) % m
        if r == 0:
            return arrs, n_
        out = [
            jnp.pad(a, [(0, r)] + [(0, 0)] * (a.ndim - 1)) for a in arrs
        ]
        # padded exponent-sum slots must stay positive (avoid div-by-zero);
        # zero coefficients already null their contributions
        out[0] = out[0].at[n_:].set(1.0)
        return out, n_

    (p_aoP, P_aoP, et_aoP, cwP), npair = pad_rows(
        [p_ao, P_ao, et_ao, cw], block
    )
    (p_axP, P_axP, et_axP, cw_axP), _ = pad_rows(
        [p_ax, P_ax, et_ax, cw_ax], block
    )
    npair_pad = p_aoP.shape[0]
    naux_pad = p_axP.shape[0]

    j3c_pair = np.zeros((npair_pad, naux_pad))
    for s in range(0, npair_pad, block):
        e = s + block
        for sa in range(0, naux_pad, block):
            ea_ = sa + block
            j3c_pair[s:e, sa:ea_] = np.asarray(
                run_3c(
                    p_aoP[s:e], P_aoP[s:e], et_aoP[s:e], cwP[s:e],
                    p_axP[sa:ea_], P_axP[sa:ea_], et_axP[sa:ea_], cw_axP[sa:ea_],
                )
            )
    j3c_pair = j3c_pair[:npair, :naux_c]

    v2c_full = np.zeros((naux_pad, naux_pad))
    for s in range(0, naux_pad, block):
        e = s + block
        for sa in range(s, naux_pad, block):
            ea_ = sa + block
            blk = np.asarray(
                run_2c(
                    p_axP[s:e], P_axP[s:e], et_axP[s:e], cw_axP[s:e],
                    p_axP[sa:ea_], P_axP[sa:ea_], et_axP[sa:ea_], cw_axP[sa:ea_],
                )
            )
            v2c_full[s:e, sa:ea_] = blk
            if sa != s:
                v2c_full[sa:ea_, s:e] = blk.T
    v2c_c = v2c_full[:naux_c, :naux_c]

    # unpack AO pairs -> full (n, n, naux_c), then cart->sph on both sides
    j3c_cart = np.zeros((n, n, naux_c))
    j3c_cart[iu, ju] = j3c_pair
    j3c_cart[ju, iu] = j3c_pair
    c2s = basis.c2s
    nao = basis.nao
    if c2s.shape[0] != n or not np.allclose(c2s, np.eye(n)):
        # c2s is (nao_sph, ncart): rows select cartesian combinations
        j3c_cart = np.einsum("ip,jq,pqx->ijx", c2s, c2s, j3c_cart, optimize=True)
    naux = ac2s.shape[0]
    if naux != naux_c or not np.allclose(ac2s, np.eye(naux_c)):
        j3c = np.einsum("ijx,yx->ijy", j3c_cart, ac2s, optimize=True)
        v2c = ac2s @ v2c_c @ ac2s.T
    else:
        j3c, v2c = j3c_cart, v2c_c
    return j3c.reshape(nao, nao, naux), v2c


def metric_factors(v2c, lindep: float = 1e-9):
    """Host-side (exact f64 eigh) factorization of the fitting metric:
    -> (V^+, V^(-1/2)) as numpy arrays, linear-dependence safe.

    Done on the HOST because TPU's f64 eigh is only f32-quality and naux
    can be thousands.  lindep=1e-9 measured best on the 'parity' aux tier:
    tighter (1e-10) keeps noise-dominated metric directions that stall
    SCF convergence (oscillating ~1e-6 dE plateaus), looser (1e-8)
    discards genuinely useful fit directions."""
    w, v = np.linalg.eigh(np.asarray(v2c))
    keep = w > lindep * w.max()
    inv = np.where(keep, 1.0 / np.where(keep, w, 1.0), 0.0)
    inv_sqrt = np.where(keep, 1.0 / np.sqrt(np.where(keep, w, 1.0)), 0.0)
    v_pinv = (v * inv) @ v.T
    v_inv_sqrt = (v * inv_sqrt) @ v.T
    return v_pinv, v_inv_sqrt


def _auto_k_dtype(nao: int, naux: int) -> str:
    """f64 B-tensor build costs O(nao^2 naux^2) emulated-f64 flops on TPU;
    keep it below ~1e12 (a few seconds), else drop to f32 MXU matmuls."""
    return "float64" if float(nao) ** 2 * float(naux) ** 2 <= 1e12 else "float32"


def make_df_builders(j3c, v2c, build_k: bool = True, k_dtype: str | None = None):
    """-> (coulomb(dm) -> J, exchange(dm) -> K, B) from DF tensors.

    v2c=None means j3c already carries an IDENTITY fitting metric --
    the Cholesky-vector case (integrals/cholesky.py), where j3c IS the
    factor L of W ~= L L^T: J = sum_r L_r (L_r . D) and K uses B = L
    directly, with no metric factorization at all.

    Otherwise the fitting-metric pseudo-inverse is factorized ON THE HOST with
    numpy's exact eigh (TPU f64 eigh is f32-quality, and naux here can be
    thousands).  J never materializes the B = j3c V^(-1/2) tensor --
    only cheap vector solves:

        rho_P = (munu|P) D,  c = V^+ rho,  J = (munu|P) c        (robust fit)

    K does need B = j3c V^(-1/2); its one-time build costs
    O(nao^2 naux^2) flops, so the dtype auto-selects: full f64 below ~1e12
    flops (everything up to ~benzene scale -- keeps DF-SCF at the 1e-6 Eh
    parity bar), f32 with HIGHEST-precision MXU matmuls beyond (DHA scale,
    where the aux-fit error dominates f32's 1e-7 anyway).
    K = sum_Q B_Q D B_Q^T -- D contracted directly between the factors
    (eigh-free; see _df_exchange_f64)."""
    j3c_dev = jnp.asarray(j3c)

    if v2c is None:  # Cholesky vectors: identity metric
        def coulomb(dm):
            return _cd_coulomb(j3c_dev, dm)

        if not build_k:
            return coulomb, None, None
        nao, _, naux = j3c_dev.shape
        if k_dtype is None:
            k_dtype = _auto_k_dtype(nao, naux)
        if k_dtype == "float64":
            def exchange(dm):
                return _df_exchange_f64(j3c_dev, dm)

            return coulomb, exchange, j3c_dev
        # cast on DEVICE: j3c may already be device-resident (prepare
        # uploads it once); a host-side cast would round-trip ~240 MB
        # over the ~10 MB/s TPU tunnel relay
        b32 = j3c_dev.astype(jnp.float32)

        def exchange(dm):
            return _df_exchange(b32, dm)

        return coulomb, exchange, b32

    v_pinv_h, v_inv_sqrt_h = metric_factors(v2c)
    v_pinv = jnp.asarray(v_pinv_h)

    # NOTE: big tensors are passed as jit ARGUMENTS, never closed over --
    # closed-over arrays embed in the lowered MLIR, and a DHA-sized j3c
    # (~700 MB) breaks the remote-compile transport outright.
    def coulomb(dm):
        return _df_coulomb(j3c_dev, v_pinv, dm)

    if not build_k:
        return coulomb, None, None

    nao, _, naux = j3c_dev.shape
    if k_dtype is None:
        k_dtype = _auto_k_dtype(nao, naux)

    if k_dtype == "float64":
        b64 = _df_b64(j3c_dev, jnp.asarray(v_inv_sqrt_h))

        def exchange(dm):
            return _df_exchange_f64(b64, dm)

        return coulomb, exchange, b64

    x32 = jnp.asarray(v_inv_sqrt_h.astype(np.float32))
    b32 = _df_b32(j3c_dev, x32)

    def exchange(dm):
        return _df_exchange(b32, dm)

    return coulomb, exchange, b32


@jax.jit
def _df_coulomb(j3c, v_pinv, dm):
    rho = jnp.einsum("ijq,ij->q", j3c, dm)
    return jnp.einsum("ijq,q->ij", j3c, v_pinv @ rho)


@jax.jit
def _cd_coulomb(l_vec, dm):
    """J from Cholesky vectors (identity metric)."""
    if l_vec.shape[0] * l_vec.shape[0] * l_vec.shape[2] > _F64_K_CHUNK_ELEMS:
        return _cd_coulomb_chunked(l_vec, dm)
    rho = jnp.einsum("ijq,ij->q", l_vec, dm)
    return jnp.einsum("ijq,q->ij", l_vec, rho)


def _cd_coulomb_chunked(l_vec, dm, chunk: int = 128):
    """Aux-chunked f64 J for north-star scale: like _df_exchange_f64_chunked,
    the monolithic einsum's emulated-f64 program kills the remote compiler
    at (377, 377, 1543) (observed: tpu_compile_helper exit 1 in the delta
    anchor's j0_64 build).  J is linear in the aux planes, so the chunk
    sum is exact."""
    bq = _aux_chunked(l_vec, chunk)

    def step(acc, bc):
        rho_c = jnp.einsum("qij,ij->q", bc, dm)
        return acc + jnp.einsum("qij,q->ij", bc, rho_c), None

    nao = l_vec.shape[0]
    j, _ = jax.lax.scan(step, jnp.zeros((nao, nao), l_vec.dtype), bq)
    return j


def _aux_chunked(b, chunk: int):
    """(nao, nao, naux) -> (nchunk, chunk, nao, nao) with zero-padded aux
    tail (zero planes contribute exactly zero to J and K)."""
    nao, _, naux = b.shape
    npad = -(-naux // chunk) * chunk
    bq = jnp.moveaxis(b, 2, 0)
    bq = jnp.pad(bq, ((0, npad - naux), (0, 0), (0, 0)))
    return bq.reshape(npad // chunk, chunk, nao, nao)


@jax.jit
def _cd_coulomb_q(bq, dm):
    """J from an aux-major (naux, nao, nao) Cholesky factor, SAME dtype
    as the factor (f64 for the 'fast' schedule's smooth J).  J's FLOP
    count is trivial (two O(naux nao^2) matvecs) -- the 40 ms of the
    (nao, nao, naux) einsum at DHA was pure layout cost; aux-major
    streams the factor twice at full bandwidth."""
    naux, nao, _ = bq.shape
    bflat = bq.reshape(naux, nao * nao)
    rho = bflat @ dm.reshape(-1)
    return (rho @ bflat).reshape(nao, nao)


@jax.jit
def _cd_coulomb_q_chunked(bq, dm, chunk: int = 128):
    """Aux-chunked variant of _cd_coulomb_q for north-star scale: the
    monolithic (naux, nao^2) f64 GEMV's emulated-matmul workspace blows
    the HBM budget at (2150, 377, 377) (the round-4 J-anchor was gated
    to <= 1 GB factors for exactly this, driver.py).  J is linear in the
    aux planes, so a lax.scan over aux chunks is exact and bounds the
    workspace to one (chunk, nao^2) slab.  Used for the 'fast'
    schedule's anchor J at nao >= ~250; the per-decade re-anchor
    cadence makes its extra scan overhead irrelevant."""
    naux, nao, _ = bq.shape
    npad = -(-naux // chunk) * chunk
    bflat = jnp.pad(bq.reshape(naux, nao * nao),
                    ((0, npad - naux), (0, 0)))
    bc = bflat.reshape(npad // chunk, chunk, nao * nao)
    dmv = dm.reshape(-1)

    def step(acc, b):
        rho = b @ dmv
        return acc + rho @ b, None

    j, _ = jax.lax.scan(step, jnp.zeros(nao * nao, bq.dtype), bc)
    return j.reshape(nao, nao)


@jax.jit
def _cd_coulomb_f32(bq32, dm):
    """J from an f32, aux-major (naux, nao, nao) copy of the Cholesky
    vectors with HIGHEST-precision f32 contractions (~1e-7 relative).
    J's FLOP count is tiny (O(naux nao^2)) but the f64 version is
    emulated-matmul-bound on TPU (measured ~55 ms/call at DHA scale);
    the SCF uses this for its far-from-convergence phase and for delta
    increments, where by linearity J(dm) = J64(dm0) + J32(dm - dm0) is
    exact up to f32 rounding of the (tiny) increment.  Aux-major layout
    makes both contractions single big (naux, nao^2) GEMV/GEMMs instead
    of naux-many 1x(nao^2) slivers."""
    h = jax.lax.Precision.HIGHEST
    naux, nao, _ = bq32.shape
    bflat = bq32.reshape(naux, nao * nao)
    dm32 = dm.astype(jnp.float32)
    rho = jnp.matmul(bflat, dm32.reshape(-1), precision=h)
    return jnp.matmul(rho, bflat, precision=h).reshape(nao, nao).astype(
        dm.dtype
    )


_QL = (((0, 2), (0, 2)), ((), ()))  # dot_general: contract (aux, l) dims


@jax.jit
def _df_exchange_fast(bq32, dm):
    """Exchange over the aux-major f32 factor, HIGHEST-precision f32
    (~1e-6 relative).  The naive (nao, nao, naux) einsum was LAYOUT-bound
    at ~124 ms/call (DHA): naux-many tiny (nao x nao) matmuls.  Aux-major
    (naux, nao, nao) planes make the half-transform one (naux*nao, nao)
    GEMM and the pairing step one (q,l)-contracting dot_general -- both
    MXU-shaped: measured 1.3 ms/call at DHA, 95x the old layout, and
    HIGHEST beats a manual 3-pass bf16 split there (5.3 ms) because
    XLA's multi-pass emulation stays inside one well-tiled GEMM.  Used
    for the mixed schedule's early phase and for delta increments
    (error ~1e-6 x increment, parity-negligible)."""
    f32 = jnp.float32
    h = jax.lax.Precision.HIGHEST
    naux, nao, _ = bq32.shape
    dm32 = dm.astype(f32)
    t = jnp.matmul(bq32.reshape(naux * nao, nao), dm32,
                   preferred_element_type=f32, precision=h).reshape(
        naux, nao, nao
    )
    # K_ij = sum_ql t[q,i,l] b[q,j,l]
    return jax.lax.dot_general(t, bq32, _QL, preferred_element_type=f32,
                               precision=h).astype(dm.dtype)


def make_fast_cd_builders(b, build_k: bool = True):
    """Fast-phase (coulomb, exchange, bq32) over a device-resident
    Cholesky factor `b` ((nao, nao, naux), any float dtype).  Builds the
    aux-major f32 copy once and also returns it: jitted cycle programs
    must receive it as an ARGUMENT (SCFSystem.df_bq32), not through the
    builder closures, or it embeds as a compile-time constant and blows
    the remote-compile body limit at scale.  See _cd_coulomb_f32 /
    _df_exchange_fast for the precision contract."""
    bq32 = jnp.transpose(jnp.asarray(b).astype(jnp.float32), (2, 0, 1))

    def coulomb(dm):
        return _cd_coulomb_f32(bq32, dm)

    if not build_k:
        return coulomb, None, bq32

    def exchange(dm):
        return _df_exchange_fast(bq32, dm)

    return coulomb, exchange, bq32


@jax.jit
def _df_b64(j3c, v_inv_sqrt):
    return jnp.einsum("ijp,pq->ijq", j3c, v_inv_sqrt)


@jax.jit
def _df_exchange_f64(b, dm):
    # K_ij = sum_q (B_q D B_q^T)_ij -- D contracted directly between the
    # factors.  Exact for ANY symmetric D (occupied-factor forms need
    # C C^T = D from an eigh, and TPU's f64 eigh returns NaN outright on
    # the degenerate {0, 2} projector spectrum of a converging density,
    # observed at nao=152); costs nao/nocc ~ 1.5x more FLOPs.
    if b.shape[0] * b.shape[0] * b.shape[2] > _F64_K_CHUNK_ELEMS:
        return _df_exchange_f64_chunked(b, dm)
    t = jnp.einsum("ikq,kl->ilq", b, dm)
    return jnp.einsum("ilq,jlq->ij", t, b)


# Above this many (nao^2 * naux) factor elements the monolithic f64
# exchange is uncompilable on a 16 GB chip: TPU f64 matmuls are emulated
# with multi-pass bf16 splits, and at north-star scale (nao=377,
# rank=1543) XLA's windowed loop carries four bf16[8, nao, nao, naux]
# copies (~14 GB) -- the remote compiler dies outright (observed:
# tpu_compile_helper exit 1 at cycle 129 of the 117-atom run).
_F64_K_CHUNK_ELEMS = 1.5e8


def _df_exchange_f64_chunked(b, dm, chunk: int = 128):
    """Aux-chunked f64 exchange: K = sum over aux chunks of B_c D B_c^T,
    one lax.scan step per chunk, peak workspace O(nao^2 chunk) instead of
    O(nao^2 naux).  Zero-padded aux planes contribute exactly zero."""
    nao = b.shape[0]
    bq = _aux_chunked(b, chunk)

    def step(acc, bc):
        t = jnp.einsum("qik,kl->qil", bc, dm)
        return acc + jnp.einsum("qil,qjl->ij", t, bc), None

    k, _ = jax.lax.scan(step, jnp.zeros((nao, nao), b.dtype), bq)
    return k


@jax.jit
def _df_b32(j3c, x32):
    return jnp.einsum(
        "ijp,pq->ijq", j3c.astype(jnp.float32), x32,
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.jit
def _df_exchange(b32, dm):
    # same D-contraction form as _df_exchange_f64 (no eigh; see there)
    dm32 = dm.astype(jnp.float32)
    t = jnp.einsum("ikq,kl->ilq", b32, dm32,
                   precision=jax.lax.Precision.HIGHEST)
    k = jnp.einsum("ilq,jlq->ij", t, b32,
                   precision=jax.lax.Precision.HIGHEST)
    return k.astype(dm.dtype)
