"""Grid-sharded XC and Fock builds via shard_map + psum.

The explicit-collective formulation of the multi-chip path (SURVEY.md
sections 2.4, 5.7): the quadrature grid is sharded across the mesh's
'grid' axis, the density matrix and Fock-side matrices are replicated,
and each chip reduces its local E_xc scalar and V_xc (nao, nao) partial
with jax.lax.psum over ICI.  The ERI tensor is sharded over its first AO
index, so J/K row-blocks build locally and psum into replicated matrices.

This communicates O(nao^2) per iteration regardless of ngrid -- the
communication-optimal layout for ngrid >> nao.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from quantum_compute_dft_tpu.parallel.mesh import GRID_AXIS
from quantum_compute_dft_tpu.xc.functionals import Functional


def sharded_xc_step(mesh: Mesh, functional: Functional):
    """Returns jitted f(dm, ao, weights, ao_grad) -> (E_xc, V_xc) where the
    grid-axis inputs are sharded over the mesh and outputs are replicated."""

    def local(dm, ao, w, ao_grad):
        phi_d = ao @ dm
        rho = jnp.einsum("gi,gi->g", phi_d, ao)
        if functional.needs_grad:
            grad_rho = 2.0 * jnp.einsum("kgi,gi->kg", ao_grad, phi_d)
            sigma = jnp.einsum("kg,kg->g", grad_rho, grad_rho)
            e, vrho, vsigma = functional.exc_vxc(rho, sigma)
            gdot = jnp.einsum("kg,kgi->gi", grad_rho, ao_grad)
            b = w[:, None] * (vrho[:, None] * ao + 2.0 * vsigma[:, None] * gdot)
        else:
            e, vrho, _ = functional.exc_vxc(rho)
            b = (w * vrho)[:, None] * ao
        exc = jax.lax.psum(w @ e, GRID_AXIS)
        v_half = jax.lax.psum(ao.T @ b, GRID_AXIS)
        return exc, 0.5 * (v_half + v_half.T)

    if functional.needs_grad:
        in_specs = (P(), P(GRID_AXIS, None), P(GRID_AXIS), P(None, GRID_AXIS, None))
    else:
        in_specs = (P(), P(GRID_AXIS, None), P(GRID_AXIS), P())

    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_fock_builders(mesh: Mesh):
    """Returns jitted (coulomb, exchange) over an ERI tensor sharded on its
    first AO index: each chip holds (nao/n, nao, nao, nao)."""

    def j_local(eri_blk, dm):
        # rows i local: J_blk[i,j] = sum_kl (ij|kl) D_kl  -- no comm needed,
        # then all_gather rows (psum of zero-padded is equivalent; gather is
        # cheaper: O(nao^2 / n) per link)
        j_blk = jnp.einsum("ijkl,kl->ij", eri_blk, dm)
        return jax.lax.all_gather(j_blk, GRID_AXIS, tiled=True)

    def k_local(eri_blk, dm):
        k_blk = jnp.einsum("ijkl,jl->ik", eri_blk, dm)
        return jax.lax.all_gather(k_blk, GRID_AXIS, tiled=True)

    jfn = jax.jit(shard_map(
        j_local, mesh=mesh,
        in_specs=(P(GRID_AXIS, None, None, None), P()), out_specs=P(),
        check_vma=False,
    ))
    kfn = jax.jit(shard_map(
        k_local, mesh=mesh,
        in_specs=(P(GRID_AXIS, None, None, None), P()), out_specs=P(),
        check_vma=False,
    ))
    return jfn, kfn


def sharded_df_builders(mesh: Mesh, j3c, v2c, build_k: bool = True,
                        k_dtype: str | None = None):
    """Density-fitted J/K over a mesh: j3c (nao, nao, naux) sharded on the
    AUX axis, density replicated, per-shard contributions psum'd over ICI.

    This is the scalable multi-chip Fock build for systems where the
    in-core (nao^4) ERI cannot exist (the 117-atom B3LYP north star:
    nao~377 -> ~160 GB in-core, vs j3c ~4 GB / n_dev per chip here).
    Replaces the reference's single-GPU (nao^2, nao^2) dgemv
    (ref src/dft_solver.cu:550-555) at a scale it cannot reach.

        rho_P  = (munu|P) D          per-shard P block, no comm
        rho    = all_gather(rho_P)   O(naux) over ICI
        c_P    = [V^+ rho]_P         row-sharded V^+
        J      = psum( (munu|P) c_P )
        K      = psum( sum_{P local} (B C)(B C)^T ),  B = j3c V^(-1/2)

    v2c=None is the Cholesky-vector case (integrals/cholesky.py): the
    metric is the identity, so J = psum((L_blk . D) L_blk) with NO
    gather at all and B = L directly.

    -> build_jk(dm) -> (J, K or None); all outputs replicated (nao, nao).
    """
    import numpy as np

    from quantum_compute_dft_tpu.integrals.density_fitting import (
        _auto_k_dtype,
        metric_factors,
    )
    from quantum_compute_dft_tpu.parallel.mesh import pad_to_multiple

    n_dev = mesh.devices.size
    j3c = np.asarray(j3c)
    nao, _, naux = j3c.shape

    j3c_p = pad_to_multiple(j3c, n_dev, 2)
    naux_pad = j3c_p.shape[2]
    aux_sharding = NamedSharding(mesh, P(None, None, GRID_AXIS))
    j3c_s = jax.device_put(j3c_p, aux_sharding)

    if v2c is None:
        # identity metric: each shard's Cholesky columns contribute
        # independently -- one psum, zero gathers
        def j_local_cd(j3c_blk, dm):
            rho_loc = jnp.einsum("ijq,ij->q", j3c_blk, dm)
            return jax.lax.psum(
                jnp.einsum("ijq,q->ij", j3c_blk, rho_loc), GRID_AXIS
            )

        jfn_cd = jax.jit(shard_map(
            j_local_cd, mesh=mesh,
            in_specs=(P(None, None, GRID_AXIS), P()),
            out_specs=P(), check_vma=False,
        ))

        def jfn(j3c_arg, _unused, dm):
            return jfn_cd(j3c_arg, dm)

        vp_s = None
    else:
        v_pinv_h, v_inv_sqrt_h = metric_factors(v2c)
        vp = np.zeros((naux_pad, naux_pad))
        vp[:naux, :naux] = v_pinv_h
        vp_s = jax.device_put(vp, NamedSharding(mesh, P(GRID_AXIS, None)))

        def j_local(j3c_blk, vp_rows, dm):
            rho_loc = jnp.einsum("ijq,ij->q", j3c_blk, dm)
            rho = jax.lax.all_gather(rho_loc, GRID_AXIS, tiled=True)
            c_loc = vp_rows @ rho
            return jax.lax.psum(
                jnp.einsum("ijq,q->ij", j3c_blk, c_loc), GRID_AXIS
            )

        jfn = jax.jit(shard_map(
            j_local, mesh=mesh,
            in_specs=(P(None, None, GRID_AXIS), P(GRID_AXIS, None), P()),
            out_specs=P(), check_vma=False,
        ))

    if not build_k:
        return lambda dm: (jfn(j3c_s, vp_s, dm), None)

    if k_dtype is None:
        k_dtype = _auto_k_dtype(nao, naux)
    # B = j3c V^(-1/2) (or the Cholesky L itself), aux-sharded.  f64 below
    # ~1e12 build flops (parity bar), f32 HIGHEST-precision MXU beyond
    # (DHA scale; see make_df_builders)
    if k_dtype == "float64":
        if v2c is None:
            b = jnp.asarray(j3c_p)
        else:
            b = jnp.einsum("ijp,pq->ijq", jnp.asarray(j3c_p),
                           jnp.asarray(pad_to_multiple(
                               pad_to_multiple(v_inv_sqrt_h, n_dev, 1), n_dev, 0)))
        prec = None
    else:
        if v2c is None:
            b = jnp.asarray(j3c_p, jnp.float32)
        else:
            b = jnp.einsum(
                "ijp,pq->ijq",
                jnp.asarray(j3c_p, jnp.float32),
                jnp.asarray(pad_to_multiple(
                    pad_to_multiple(v_inv_sqrt_h, n_dev, 1), n_dev, 0),
                    jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
        prec = jax.lax.Precision.HIGHEST
    b_s = jax.device_put(b, aux_sharding)

    def k_local(b_blk, dm):
        # K = sum_q B_q D B_q^T: D contracted directly between the factors
        # (eigh-free -- TPU's f64 eigh NaNs on the degenerate projector
        # spectrum of a converging density; see _df_exchange_f64)
        t = jnp.einsum("ikq,kl->ilq", b_blk, dm.astype(b_blk.dtype),
                       precision=prec)
        k = jnp.einsum("ilq,jlq->ij", t, b_blk, precision=prec)
        return jax.lax.psum(k, GRID_AXIS)

    kfn = jax.jit(shard_map(
        k_local, mesh=mesh,
        in_specs=(P(None, None, GRID_AXIS), P()),
        out_specs=P(), check_vma=False,
    ))

    def build_jk(dm):
        j = jfn(j3c_s, vp_s, dm)
        k = kfn(b_s, dm).astype(dm.dtype)
        return j, k

    return build_jk
