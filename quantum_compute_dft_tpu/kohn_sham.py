"""High-level restricted Kohn-Sham API.

One-call equivalent of the reference's whole driver pipeline
(ref dft.py:101-269): build molecule data (grid.build, ref grid.py:42-67),
AO values/gradients (ref grid.py:23-39), upload, SCF, report.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from quantum_compute_dft_tpu.basis import build_basis
from quantum_compute_dft_tpu.engine.ao_eval import eval_ao
from quantum_compute_dft_tpu.grids import Grid, build_grid
from quantum_compute_dft_tpu.integrals import eri_full, one_electron
from quantum_compute_dft_tpu.mol import Molecule
from quantum_compute_dft_tpu.scf.driver import (
    SCFResult,
    SCFSystem,
    make_system,
    scf_host,
)
from quantum_compute_dft_tpu.xc.functionals import FUNCTIONALS, Functional


# in-core ERIs below/at this nao, density fitting above (see prepare)
AUTO_DF_NAO = 64


@dataclasses.dataclass
class KSSetup:
    sys: SCFSystem
    functional: Functional
    nao: int
    ngrid: int
    nocc: int
    build_time: float
    grid: Grid


def prepare(
    mol: Molecule,
    functional: str | Functional = "LDA",
    grid_level: int = 3,
    grid: Grid | None = None,
    prune: bool = True,
    density_fit: bool | None = None,
    df_aux: str = "parity",
    _df_override: tuple | None = None,
    skip_fast_b64: bool = False,
    lean_ao: bool | None = None,
) -> KSSetup:
    """CPU/host data build + device upload (ref dft.py:118-176).

    density_fit=None auto-selects: in-core ERIs for small systems
    (nao <= 64), pivoted-Cholesky density fitting beyond -- at Decane
    scale and up the O(npair^2) in-core quartet build costs ~10x the
    O(npair * rank) Cholesky factorization, whose error is <= 1e-7
    elementwise by construction.  The reference has only the in-core
    path (ref grid.py:65).  df_aux picks the factorization:
      'parity' (default): pivoted-Cholesky ERI vectors (tol 1e-7,
        integrals/cholesky.py) -- guaranteed elementwise ERI error,
        SCF energies within ~1e-6 Eh of in-core;
      'fast': small even-tempered RI auxiliary set, ~2e-5 Eh error at a
        lower one-time build cost."""
    import os

    t0 = time.time()
    verbose = os.environ.get("DFT_SETUP_VERBOSE") == "1"

    def _tick(label, t_prev=[None]):
        if verbose:
            now = time.time()
            if t_prev[0] is not None:
                print(f"  setup/{label}: {now - t_prev[0]:.1f}s", flush=True)
            t_prev[0] = now

    fn = FUNCTIONALS[functional.upper()] if isinstance(functional, str) else functional

    _tick(None)
    basis = build_basis(mol)
    from quantum_compute_dft_tpu import setup_cache

    ck = setup_cache.molecule_basis_key(mol, basis)
    hit = setup_cache.load("int1e", ck, ("s", "t", "v"))
    if hit is not None:
        s, t, v = hit
    else:
        s, t, v = one_electron(basis, mol.coords, mol.charges)
        setup_cache.store("int1e", ck, s=s, t=t, v=v)
    hcore = t + v
    _tick("one_electron")
    if density_fit is None:
        density_fit = basis.nao > AUTO_DF_NAO
    df_j = df_k = df_k_hi = df_j_fast = df_k_fast = None
    j3c = v2c = j3c_dev = None
    eri = None
    if density_fit or _df_override is not None:
        from quantum_compute_dft_tpu.integrals.density_fitting import (
            df_tensors,
            make_df_builders,
        )

        if _df_override is not None:
            # externally supplied factorization (e.g. a custom-tolerance
            # Cholesky from tools/dryrun_northstar.py)
            j3c, v2c = _df_override
        elif df_aux == "parity":
            from quantum_compute_dft_tpu.integrals.cholesky import (
                cholesky_eri_vectors,
            )

            hit = setup_cache.load("cdvec", ck, ("l_vec",))
            if hit is not None:
                j3c = hit[0]
            else:
                j3c = cholesky_eri_vectors(basis)
                setup_cache.store("cdvec", ck, l_vec=j3c)
            v2c = None
        else:
            j3c, v2c = df_tensors(basis, mol, aux_level=df_aux)
        _tick("df_factorization")
        # upload the (possibly ~240 MB at DHA scale) factor ONCE; both
        # builder variants below then reuse the device-resident array
        # (jnp.asarray of a device array is a no-op) instead of paying
        # the ~10 MB/s tunnel relay per make_df_builders call
        import jax.numpy as jnp

        j3c_dev = jnp.asarray(j3c) if j3c is not None else None
        # skip_fast_b64 (north-star-scale mixed schedule): per-cycle K
        # comes from the aux-major f32 factor (k_arg) and anchors from
        # the f64 path, so the auto-f32 ij-major K copy (~1.2 GB at
        # nao=377) would be pure transient HBM -- build K f64-only
        df_j, df_k, b_ret = make_df_builders(
            j3c_dev, v2c, build_k=fn.hyb_coeff != 0.0,
            k_dtype="float64" if skip_fast_b64 else None)
        # fast-phase builders (f32-HIGHEST aux-major J/K) for the mixed/
        # fast schedules -- Cholesky mode only (identity metric: the
        # factor IS the K tensor).  Only the accelerator path (or the
        # Pallas interpreter used by the CPU test suite) ever calls
        # them: the CPU backend coerces every schedule to 'f64', so
        # skip the ~133 MB f32 + ~266 MB f64 aux-major copies there.
        import jax as __jax

        fast_eligible = (__jax.default_backend() != "cpu"
                         or os.environ.get("DFT_PALLAS_INTERPRET") == "1")
        if v2c is None and fast_eligible:
            from quantum_compute_dft_tpu.integrals.density_fitting import (
                make_fast_cd_builders,
            )

            df_j_fast, df_k_fast, bq32 = make_fast_cd_builders(
                b_ret if b_ret is not None else j3c_dev,
                build_k=fn.hyb_coeff != 0.0,
            )
        else:
            df_j_fast = df_k_fast = bq32 = None
        if bq32 is not None and bq32.nbytes > 5e8:
            # drain the DF pipeline (upload + f32 cast + aux-major
            # transpose, ~2x factor size of transients) BEFORE the AO
            # eval enqueues its multi-GB planes: the axon queue is fully
            # async and unforced pipelines peak at the sum of all their
            # buffers (measured OOM at the L1 north star)
            float(bq32[0, 0, 0])
        # high-precision K for the f64 parity tail of the mixed SCF: when
        # the fast exchange auto-selected f32 (DHA scale), keep an f64
        # variant too -- in Cholesky mode it costs nothing to build
        # (B = L, no metric transform)
        df_k_hi = df_k
        if df_k is not None and v2c is None and not skip_fast_b64:
            from quantum_compute_dft_tpu.integrals.density_fitting import (
                _auto_k_dtype,
            )

            if _auto_k_dtype(j3c.shape[0], j3c.shape[2]) != "float64":
                _, df_k_hi, _ = make_df_builders(
                    j3c_dev, v2c, build_k=True, k_dtype="float64"
                )
    else:
        hit = setup_cache.load("eri", ck, ("eri",)) if basis.nao <= 80 else None
        if hit is not None:
            eri = hit[0]
        else:
            eri = eri_full(basis)
            if basis.nao <= 80:  # (nao^4)*8B; 80 -> 330 MB cap
                setup_cache.store("eri", ck, eri=np.asarray(eri))
        _tick("eri_full")
    if grid is None:
        gkey = f"{ck}_L{grid_level}_p{int(prune)}"
        hit = setup_cache.load("grid", gkey, ("coords", "weights", "atom_idx"))
        if hit is not None:
            grid = Grid(coords=hit[0], weights=hit[1], atom_idx=hit[2])
        else:
            grid = build_grid(mol, level=grid_level, prune=prune)
            setup_cache.store("grid", gkey, coords=grid.coords,
                              weights=grid.weights, atom_idx=grid.atom_idx)
    _tick("grid")

    # keep AO arrays device-resident off-CPU: the host<->TPU relay here
    # moves ~10 MB/s and a large-molecule AO+grad set is gigabytes
    import jax as _jax

    as_numpy = _jax.default_backend() == "cpu"
    # Lean-AO mode (large-scale TPU runs): the persistent f64 AO+grad
    # planes are (1+3)*ngrid*nao*8 bytes of HBM -- 6.5 GB at the
    # 117-atom north star with a level-1 grid, which together with the
    # DF factors and the packed f32 planes overflows the 16 GB chip.
    # The f64 planes are only touched O(1) times per SCF (delta
    # anchors, final parity energy), so: build them TRANSIENTLY with the
    # in-place chunk scan (eval_planes_scan -- the eval_ao concatenate
    # path double-buffers ~10 GB of gradient chunks), pack the per-cycle
    # f32 Pallas planes, free the f64 planes, and let the f64 XC
    # evaluations stream on-device AO chunks
    # (engine.xc_engine.xc_step_onfly; bitwise the same AO values).
    # The delta64 endgame re-materializes f64 planes once, swapping
    # them for the then-unused packed planes (scf.driver).
    plane_bytes = (1 + 3 * int(fn.needs_grad)) * grid.ngrid * basis.nao * 8
    if lean_ao is None:
        lean_ao = (not as_numpy and _jax.default_backend() != "cpu"
                   and plane_bytes > 3.5e9)
    ao_tables = None
    packed_ent = None
    if lean_ao:
        import jax.numpy as jnp

        from quantum_compute_dft_tpu.engine.ao_eval import (
            device_tables,
            eval_planes_scan,
        )
        from quantum_compute_dft_tpu.engine import pallas_xc as _px

        # sequence the async pipeline with materialization fences: on
        # the axon TPU, enqueued work only executes at a materialization
        # point (block_until_ready is a no-op), so an unfenced pipeline
        # peaks at the SUM of all its buffers -- measured OOM at the L1
        # north star.  Each fence is one ~33 ms scalar fetch.
        chunk = 8192
        g = grid.ngrid
        gpad = (-g) % chunk
        crd = jnp.pad(jnp.asarray(grid.coords, jnp.float64),
                      ((0, gpad), (0, 0)))
        w_pad = jnp.pad(jnp.asarray(grid.weights, jnp.float64), (0, gpad))
        tables = device_tables(basis)
        ao_p, grad_p = eval_planes_scan(crd, tables, fn.needs_grad, chunk,
                                        split_grad=True)
        float(ao_p[0, 0])  # planes built (peak: planes + one eval chunk)
        # pack plane-by-plane, freeing each f64 buffer right after its
        # packed f32 copy materializes -- the one-call packer's peak
        # (all f64 planes + all packed planes + cast transients) was
        # measured to OOM at L1 scale.  Padded rows carry zero
        # quadrature weight -> the packed wt row zeroes their XC
        # contribution exactly.
        npad = _px._npad_for(basis.nao)
        tl = _px._tile_for(npad, _px.DEFAULT_TILE)
        gpad_t = _px._round_up(int(w_pad.shape[0]), tl)
        aot = _px._pack_plane(ao_p, npad, gpad_t)
        float(aot[0, 0])
        ao_p = None
        wt = (jnp.zeros((1, gpad_t), jnp.float32)
              .at[0, :w_pad.shape[0]].set(w_pad.astype(jnp.float32)))
        grads_t = None
        if fn.needs_grad:
            grads_t = []
            for k in range(3):
                gk = _px._pack_plane(grad_p[k], npad, gpad_t)
                float(gk[0, 0])
                grad_p[k] = None
                grads_t.append(gk)
            grads_t = tuple(grads_t)
        packed_ent = (aot, wt, grads_t)
        ao_p = grad_p = None
        ao = ao_grad = None
        ao_tables = (jnp.asarray(grid.coords, jnp.float64), tables)
        _tick("lean_pack")
    elif fn.needs_grad:
        ao, ao_grad = eval_ao(basis, grid.coords, deriv=1, as_numpy=as_numpy)
        _tick("ao_eval")
    else:
        ao = eval_ao(basis, grid.coords, deriv=0, as_numpy=as_numpy)
        ao_grad = None
        _tick("ao_eval")

    from quantum_compute_dft_tpu.basis.basis_set import sad_occupations

    sys = make_system(
        hcore, s, eri, ao, grid.weights, ao_grad, mol.energy_nuc(), mol.nocc,
        df_coulomb=df_j, df_exchange=df_k, df_j3c=j3c, df_v2c=v2c,
        df_exchange_hi=df_k_hi if density_fit or _df_override else None,
        df_coulomb_fast=df_j_fast if density_fit or _df_override else None,
        df_exchange_fast=df_k_fast if density_fit or _df_override else None,
        # aux-major f64 Cholesky factor as a passable jit argument (the
        # 'fast' schedule's smooth J; see _cd_coulomb_q); skipped on the
        # pure-CPU backend along with the fast builders
        # skip_fast_b64 (north-star-scale mixed runs): the mixed schedule
        # never runs the 'fast' smooth-J (_cd_coulomb_q), so this ~2 GB
        # transpose copy would be dropped right after prepare; the flag
        # also builds K f64-only above (no auto-f32 ij-major copy)
        df_b64=(jnp.transpose(j3c_dev, (2, 0, 1))
                if (density_fit or _df_override) and v2c is None
                and df_j_fast is not None and not skip_fast_b64
                else None),
        df_bq32=bq32 if density_fit or _df_override else None,
        sad_occ=sad_occupations(basis, mol.charges, mol.nelec),
        nopen=mol.nopen,
        ao_tables=ao_tables,
    )
    if packed_ent is not None:
        from quantum_compute_dft_tpu.scf.driver import seed_packed

        seed_packed(sys, fn.needs_grad, packed_ent)
    _tick("make_system")
    return KSSetup(
        sys=sys,
        functional=fn,
        nao=basis.nao,
        ngrid=grid.ngrid,
        nocc=mol.nocc,
        build_time=time.time() - t0,
        grid=grid,
    )


def run(
    mol: Molecule,
    functional: str | Functional = "LDA",
    grid_level: int = 3,
    callback=None,
    **kwargs,
) -> SCFResult:
    setup = prepare(mol, functional, grid_level=grid_level)
    return scf_host(setup.sys, setup.functional, callback=callback, **kwargs)
