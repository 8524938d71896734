"""Pallas fused XC kernel -- the TPU performance path.

The tiled analog of the reference's fused CUDA pipeline
(ref src/dft_solver.cu:559-672), restructured for the TPU memory
hierarchy: grid tiles of AO values (and gradients) stream HBM -> VMEM;
per tile the kernel computes

    phi_D = AO_tile @ D           (MXU)
    rho   = row-dot(phi_D, AO)    (VPU)
    eps, vrho[, vsigma]           (VPU, elementwise functional)
    B     = w * (vrho * AO [+ 2 vsigma grad-rho . grad-AO])
    V    += AO_tile^T @ B         (MXU, accumulated in VMEM across tiles)
    E    += sum(w * rho * eps)

so the (ngrid x nao) B matrix of the reference (dft_solver.cu:577,613,655)
never exists in HBM -- only one tile lives in VMEM at a time.  This is
the "grid-dimension blocking" sequence-parallel analog of SURVEY.md
section 5.7.

Compute is f32 (TPU Pallas has no f64); the f64 jnp engine
(engine/xc_engine.py) remains the parity path.  Functional derivatives
come from the same autodiff machinery as the f64 path -- jax.grad traces
fine inside a Pallas kernel body.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantum_compute_dft_tpu.xc.functionals import Functional, MIN_GRAD, RHO_EPS


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _functional_eval(functional: Functional, rho, sigma):
    """Elementwise (e, vrho, vsigma) inside the kernel, f32, guarded."""
    eps32 = 1e-10  # f32-appropriate density floor (f64 path uses 1e-12)
    rho_s = jnp.maximum(rho, eps32)
    live = rho > eps32
    zero = jnp.zeros_like(rho)
    if functional.needs_grad:
        sig_s = jnp.maximum(sigma, 1e-18)
        e, (vr, vs) = jax.vmap(jax.value_and_grad(functional.f, argnums=(0, 1)))(
            rho_s, sig_s
        )
        return (
            jnp.where(live, e, zero),
            jnp.where(live, vr, zero),
            jnp.where(live, vs, zero),
        )
    e, vr = jax.vmap(jax.value_and_grad(functional.f))(rho_s)
    return jnp.where(live, e, zero), jnp.where(live, vr, zero), None


def _make_kernel(functional: Functional):
    if functional.needs_grad:

        def kernel(dm_ref, ao_ref, w_ref, gx_ref, gy_ref, gz_ref,
                   e_ref, v_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                v_ref[:, :] = jnp.zeros_like(v_ref)
                e_ref[:, :] = jnp.zeros_like(e_ref)

            ao = ao_ref[:, :]
            w = w_ref[:, 0]
            phi_d = jnp.dot(ao, dm_ref[:, :], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            rho = jnp.sum(phi_d * ao, axis=1)
            gx, gy, gz = gx_ref[:, :], gy_ref[:, :], gz_ref[:, :]
            grx = 2.0 * jnp.sum(gx * phi_d, axis=1)
            gry = 2.0 * jnp.sum(gy * phi_d, axis=1)
            grz = 2.0 * jnp.sum(gz * phi_d, axis=1)
            sigma = grx * grx + gry * gry + grz * grz
            e, vrho, vsigma = _functional_eval(functional, rho, sigma)
            # Mosaic lowers only lane-axis (last-dim) reductions; reduce
            # the per-point energies with an MXU matmul against ones and
            # accumulate the (1, 128) row (every lane holds the tile sum).
            wem = jnp.broadcast_to((w * e)[:, None], (ao.shape[0], 128))
            e_ref[:, :] += jnp.dot(
                jnp.ones((8, ao.shape[0]), jnp.float32), wem,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            gdot = grx[:, None] * gx + gry[:, None] * gy + grz[:, None] * gz
            b = w[:, None] * (vrho[:, None] * ao + 2.0 * vsigma[:, None] * gdot)
            v_ref[:, :] += jnp.dot(
                ao.T, b, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    else:

        def kernel(dm_ref, ao_ref, w_ref, e_ref, v_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                v_ref[:, :] = jnp.zeros_like(v_ref)
                e_ref[:, :] = jnp.zeros_like(e_ref)

            ao = ao_ref[:, :]
            w = w_ref[:, 0]
            phi_d = jnp.dot(ao, dm_ref[:, :], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            rho = jnp.sum(phi_d * ao, axis=1)
            e, vrho, _ = _functional_eval(functional, rho, None)
            wem = jnp.broadcast_to((w * e)[:, None], (ao.shape[0], 128))
            e_ref[:, :] += jnp.dot(
                jnp.ones((8, ao.shape[0]), jnp.float32), wem,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            b = (w * vrho)[:, None] * ao
            v_ref[:, :] += jnp.dot(
                ao.T, b, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("functional", "tile"))
def xc_step_pallas(
    functional: Functional,
    dm: jnp.ndarray,
    ao: jnp.ndarray,
    weights: jnp.ndarray,
    ao_grad: Optional[jnp.ndarray] = None,
    tile: int = 512,
):
    """Fused-tile XC build, f32: -> (E_xc, V_xc) with the same contract as
    engine.xc_engine.xc_step."""
    g, n = ao.shape
    npad = _round_up(n, 128)
    # per-tile VMEM scales with tile*npad (5 streamed planes + temporaries,
    # double-buffered); shrink the grid tile as the AO dim grows so the
    # working set stays inside VMEM at DHA-and-up sizes
    tile = max(128, tile * 128 // npad)
    gpad = _round_up(g, tile)

    f32 = jnp.float32
    ao_p = jnp.zeros((gpad, npad), f32).at[:g, :n].set(ao.astype(f32))
    w_p = jnp.zeros((gpad, 1), f32).at[:g, 0].set(weights.astype(f32))
    dm_p = jnp.zeros((npad, npad), f32).at[:n, :n].set(dm.astype(f32))

    n_tiles = gpad // tile
    kernel = _make_kernel(functional)

    grid_in = [
        pl.BlockSpec((npad, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [dm_p, ao_p, w_p]
    if functional.needs_grad:
        for k in range(3):
            gk = jnp.zeros((gpad, npad), f32).at[:g, :n].set(
                ao_grad[k].astype(f32)
            )
            args.append(gk)
            grid_in.append(
                pl.BlockSpec((tile, npad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )

    # Mosaic rejects i64 block-index maps; trace the kernel with x64 off
    # (all tensor data is explicitly f32 already).
    with jax.enable_x64(False):
        e_out, v_out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=grid_in,
            out_specs=(
                pl.BlockSpec((8, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npad, npad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((8, 128), f32),
                jax.ShapeDtypeStruct((npad, npad), f32),
            ),
            # the default 16 MB scoped-vmem budget rejects npad >= 256
            # (DHA-sized nao); v5e has 128 MB of VMEM -- let the kernel
            # use a third of it
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024,
            ),
        )(*args)

    v = v_out[:n, :n].astype(dm.dtype)
    return e_out[0, 0].astype(dm.dtype), 0.5 * (v + v.T)
