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
