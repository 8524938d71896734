"""Pallas fused XC kernel -- the TPU performance path.

The tiled analog of the reference's fused CUDA pipeline
(ref src/dft_solver.cu:559-672), restructured for the TPU memory
hierarchy: grid tiles of AO values (and gradients) stream HBM -> VMEM;
per tile the kernel computes

    phi_D = D @ AO^T              (MXU)
    rho   = column-dot            (skinny MXU matmul)
    eps, vrho[, vsigma]           (VPU, elementwise functional)
    B^T   = w * (vrho * AO^T [+ 2 vsigma grad-rho . grad-AO^T])
    V    += AO^T (NT) B^T         (MXU dot_general, accumulated in VMEM)
    E    += sum(w * rho * eps)

so the (ngrid x nao) B matrix of the reference (dft_solver.cu:577,613,655)
never exists in HBM -- only one tile lives in VMEM at a time.  This is
the "grid-dimension blocking" sequence-parallel analog of SURVEY.md
section 5.7.

Layout note (measured on v5e): everything is stored TRANSPOSED --
(nao_pad, tile) -- so per-grid-point quantities (rho, sigma, vrho, ...)
are (1, tile) lane-vectors.  In the naive (tile, nao_pad) layout the
lane-axis reduction leaves per-point vectors lane-REPLICATED: every one
of the ~250 elementwise ops in the autodiff functional then costs
tile/8 VPU rows instead of tile/128, and the functional dominated the
kernel (~70% of 9.5 ms/call on benzene).  Reductions over the AO axis
become skinny (1, nao) @ (nao, tile) MXU matmuls, and the V_xc
contraction contracts the shared grid axis of two (nao_pad, tile)
operands directly (an NT dot_general) with no transposes anywhere.

Compute is f32 (TPU Pallas has no f64); the f64 jnp engine
(engine/xc_engine.py) remains the parity path.  Functional derivatives
come from the same autodiff machinery as the f64 path -- jax.grad traces
fine inside a Pallas kernel body.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantum_compute_dft_tpu.xc.functionals import Functional, MIN_GRAD, RHO_EPS


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# A/B experiment knobs, read ONCE at import: reading them at jit-trace
# time let a mid-process env change desynchronize the cached packed-plane
# shapes (seeded by kohn_sham.prepare) from later xc_step_pallas traces.
_ENV_NPAD_GRAN = int(os.environ.get("DFT_PALLAS_NPAD_GRAN", "8"))
_ENV_TILE = os.environ.get("DFT_PALLAS_TILE")
# row reductions (rho, grad-rho dots, E) as VPU sublane sums instead of
# skinny (1, npad) MXU matmuls.  Default OFF: Mosaic cannot shape-cast
# the sublane-reduced (1, tile) row to the (8, tile/8) functional
# subtile ("infer-vector-layout: unsupported shape cast" on v5e), so
# the matmul variant -- whose output layout does relayout cleanly -- is
# the only compiling path for the functional inputs.  The flag remains
# for future Mosaic versions.
_ENV_VPU_REDUCE = os.environ.get("DFT_PALLAS_VPU_REDUCE", "0") == "1"
# kernel ablation instrumentation (bench-only, wrong results by design):
# "nofunc" stubs the ~400-op autodiff functional, "nov" skips the B
# assembly + V-accumulation matmul, "noprod" replaces the four
# (npad, tile) elementwise products feeding the row reductions with
# plane reuses.  Used by tools/pallas_sweep.py to attribute the
# measured-vs-roofline gap to VPU phases; never set in production.
_ENV_ABLATE = os.environ.get("DFT_PALLAS_ABLATE", "")


def _npad_for(n: int) -> int:
    """Sublane row count of the packed AO planes: 8-granular (the f32
    VPU sublane tile), NOT 128.  The MXU pads the matmuls' lane/
    contraction dims to its 128x128 tile internally regardless, but the
    STREAMED plane rows and every elementwise (nrow, tile) VPU op scale
    with the stored row count -- at DHA (nao=152) the old 128-granular
    padding streamed 256 rows, a 1.68x HBM and VPU tax the hardware
    never required (round-4 instrument fix made this visible; see
    BASELINE.md joint-roofline table).  DFT_PALLAS_NPAD_GRAN overrides
    (A/B experiments; 128 restores the round-3 layout; read at import,
    see _ENV_NPAD_GRAN)."""
    return _round_up(n, _ENV_NPAD_GRAN)


def _vmap_nd(fn, ndim: int):
    for _ in range(ndim):
        fn = jax.vmap(fn)
    return fn


def _functional_eval(functional: Functional, rho, sigma):
    """Elementwise (e, vrho, vsigma) inside the kernel, f32, guarded.
    Shape-agnostic (vmaps over every axis of the input)."""
    eps32 = 1e-10  # f32-appropriate density floor (f64 path uses 1e-12)
    rho_s = jnp.maximum(rho, eps32)
    live = rho > eps32
    zero = jnp.zeros_like(rho)
    if functional.needs_grad:
        sig_s = jnp.maximum(sigma, 1e-18)
        e, (vr, vs) = _vmap_nd(
            jax.value_and_grad(functional.f, argnums=(0, 1)), rho.ndim
        )(rho_s, sig_s)
        return (
            jnp.where(live, e, zero),
            jnp.where(live, vr, zero),
            jnp.where(live, vs, zero),
        )
    e, vr = _vmap_nd(jax.value_and_grad(functional.f), rho.ndim)(rho_s)
    return jnp.where(live, e, zero), jnp.where(live, vr, zero), None


_NT = (((1,), (1,)), ((), ()))  # dot_general: contract last dim of both


def _make_kernel(functional: Functional, npad: int, phi_split: bool = False):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    H = jax.lax.Precision.HIGHEST

    def mm(a, b):
        # skinny row-reductions: HIGHEST (exact f32), MXU cost negligible
        return jnp.dot(a, b, preferred_element_type=f32, precision=H)

    # The V-accumulation matmul (2*npad^2*tile FLOPs) uses a manual
    # 3-pass bf16 split (a_hi@b_hi + a_hi@b_lo + a_lo@b_hi ~ f32-quality
    # products): Mosaic only offers DEFAULT (1-pass bf16, too coarse) and
    # HIGHEST (6-pass exact f32) -- the split halves that matmul's MXU
    # time.  phi_D default is HIGHEST: its error feeds the density and was
    # measured to cost SCF cycles when used for the WHOLE SCF (benzene
    # 25 -> 31 with split phi_D).  phi_split=True applies the same 3-pass
    # split to phi_D (~16-bit product mantissa, rel err ~1e-5) -- safe for
    # the far-from-convergence cycles of the mixed schedule, where the
    # f64 tail (or the safe kernel past the switch tolerance) restores
    # full precision; it removes half the remaining MXU passes.
    def split(x):
        hi = x.astype(bf16)
        lo = (x - hi.astype(f32)).astype(bf16)
        return hi, lo

    def d1(x, y):
        return jnp.dot(x, y, preferred_element_type=f32)

    def nt1(x, y):
        return jax.lax.dot_general(x, y, _NT, preferred_element_type=f32)

    def nt3(ah, al, b):
        bh, bl = split(b)
        return nt1(ah, bh) + nt1(ah, bl) + nt1(al, bh)

    if phi_split:

        def mm_phi(dm, aoh, aol, aot):
            dmh, dml = split(dm)
            return d1(dmh, aoh) + d1(dmh, aol) + d1(dml, aoh)

    else:

        def mm_phi(dm, aoh, aol, aot):
            return mm(dm, aot)

    if _ENV_VPU_REDUCE:
        # AO-axis row reduction on the VPU (sublane sums): same f32
        # accumulation class as the skinny matmul, but overlaps the MXU
        # instead of serializing the systolic array at m=8/128
        # utilization (see _ENV_VPU_REDUCE -- default OFF, Mosaic
        # layout limitation)
        def rowsum(ones_row, x):
            return jnp.sum(x, axis=0, keepdims=True)

        def e_acc(e_ref, we, tile):
            e_ref[:, :] += jnp.broadcast_to(jnp.sum(we), (8, 128))

    else:
        # 2-pass exact skinny reductions: a selector row of 1.0/0.0 is
        # EXACT in bf16, so ones @ x = ones_bf16 @ x_hi + ones_bf16 @
        # x_lo with every product exact and f32 pass accumulation --
        # the same accuracy class as the 6-pass HIGHEST lowering at a
        # third of its MXU passes (the five row reductions were ~15% of
        # the modeled MXU floor at DHA shape).
        def rowsum(ones_row, x):
            xh, xl = split(x)
            ob = ones_row.astype(bf16)
            return d1(ob, xh) + d1(ob, xl)

        def e_acc(e_ref, we, tile):
            ones_t = jnp.ones((tile, 128), bf16)
            weh, wel = split(we)
            e_ref[:, :] += jnp.broadcast_to(
                d1(weh, ones_t) + d1(wel, ones_t), (8, 128)
            )

    if functional.needs_grad:

        def kernel(dm_ref, ao_ref, w_ref, gx_ref, gy_ref, gz_ref, ones_ref,
                   e_ref, v_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                v_ref[:, :] = jnp.zeros_like(v_ref)
                e_ref[:, :] = jnp.zeros_like(e_ref)

            aot = ao_ref[:, :]          # (npad, tile)
            wt = w_ref[:, :]            # (1, tile)
            ones_row = ones_ref[:, :]   # (1, npad)
            aoh, aol = split(aot)       # for the V-accumulation matmul
            # phi_D: exact-f32 (HIGHEST) by default -- its error enters
            # the density itself; 3-pass split when phi_split (early
            # mixed-mode cycles only).  The V accumulation always
            # tolerates 3-pass products (Fock perturbation ~1e-7,
            # absorbed by DIIS).
            if _ENV_ABLATE == "nophi":  # bench ablation: skip phi_D GEMM
                phi_d = aot
            elif _ENV_ABLATE == "phi3":  # bench ablation: 3-pass phi_D
                dmh, dml = split(dm_ref[:, :])
                phi_d = d1(dmh, aoh) + d1(dmh, aol) + d1(dml, aoh)
            else:
                phi_d = mm_phi(dm_ref[:, :], aoh, aol, aot)  # MXU
            gx, gy, gz = gx_ref[:, :], gy_ref[:, :], gz_ref[:, :]
            if _ENV_ABLATE == "noprod":  # bench ablation: see _ENV_ABLATE
                rho = rowsum(ones_row, phi_d)
                grx = 2.0 * rowsum(ones_row, gx)
                gry = 2.0 * rowsum(ones_row, gy)
                grz = 2.0 * rowsum(ones_row, gz)
            else:
                rho = rowsum(ones_row, phi_d * aot)  # (1, tile)
                grx = 2.0 * rowsum(ones_row, gx * phi_d)
                gry = 2.0 * rowsum(ones_row, gy * phi_d)
                grz = 2.0 * rowsum(ones_row, gz * phi_d)
            sigma = grx * grx + gry * gry + grz * grz
            # evaluate the ~400-op autodiff functional on (8, tile/8)
            # subtiles: a (1, tile) row occupies tile/128 VPU registers at
            # 1/8 sublane utilization; reshaped, the same work runs on
            # 8x denser registers (two cheap relayouts per quantity)
            t8 = aot.shape[1] // 8
            if _ENV_ABLATE == "nofunc":  # bench ablation: linear stub
                e8 = rho.reshape(8, t8)
                vr8 = e8
                vs8 = sigma.reshape(8, t8)
            else:
                e8, vr8, vs8 = _functional_eval(
                    functional, rho.reshape(8, t8), sigma.reshape(8, t8)
                )
            e = e8.reshape(1, -1)
            vrho = vr8.reshape(1, -1)
            vsigma = vs8.reshape(1, -1)
            e_acc(e_ref, wt * e, aot.shape[1])
            # (1, tile) rows sublane-broadcast against (npad, tile)
            # planes; w and vsigma fold into (1, tile) rows FIRST (u_k =
            # 2 w vsigma grad_rho_k), so the plane-scale work is 7 ops
            # (vr*ao + 3 u*g mults + 3 adds) with no (npad, tile) gdot
            # intermediate
            wvr = wt * vrho
            wvs = 2.0 * wt * vsigma
            if _ENV_ABLATE != "nov":  # bench ablation: skip B + V GEMM
                bt = (wvr * aot + (wvs * grx) * gx
                      + (wvs * gry) * gy + (wvs * grz) * gz)
                v_ref[:, :] += nt3(aoh, aol, bt)     # (npad, npad) MXU

    else:

        def kernel(dm_ref, ao_ref, w_ref, ones_ref, e_ref, v_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                v_ref[:, :] = jnp.zeros_like(v_ref)
                e_ref[:, :] = jnp.zeros_like(e_ref)

            aot = ao_ref[:, :]
            wt = w_ref[:, :]
            ones_row = ones_ref[:, :]
            aoh, aol = split(aot)  # for the V matmul; see the GGA branch
            phi_d = mm_phi(dm_ref[:, :], aoh, aol, aot)
            rho = rowsum(ones_row, phi_d * aot)
            t8 = aot.shape[1] // 8  # subtiled eval: see the GGA branch
            e8, vr8, _ = _functional_eval(
                functional, rho.reshape(8, t8), None
            )
            e = e8.reshape(1, -1)
            vrho = vr8.reshape(1, -1)
            e_acc(e_ref, wt * e, aot.shape[1])
            bt = (wt * vrho) * aot
            v_ref[:, :] += nt3(aoh, aol, bt)

    return kernel


def _tile_for(npad: int, tile: int) -> int:
    if _ENV_TILE:  # A/B experiments: force the grid-tile size (import-
        # time read, see _ENV_TILE).  Round to the 1024 multiple the
        # (8, tile/8) functional subtiling requires -- Mosaic rejects
        # other shapes -- instead of letting the override bypass it.
        return max(1024, int(_ENV_TILE) // 1024 * 1024)
    # Small AO dims are DISPATCH/grid-step-bound, not bandwidth-bound:
    # benzene (npad 40) measured 0.58 ms at 12 tiles of 12288 vs
    # 0.19 ms at 3 tiles of 49152 (round-5 sweep, tools/pallas_sweep.py)
    # -- so small shapes take the largest tile the VMEM budget allows.
    if npad <= 40:
        return 49152
    if npad <= 64:
        return 24576
    if npad <= 96:
        return 12288
    # per-tile VMEM scales with tile*npad (streamed planes + temporaries,
    # double-buffered); shrink the grid tile as the AO dim grows so the
    # working set stays inside the (raised) VMEM budget at DHA-and-up sizes.
    # The (8, tile/8) functional subtiling needs tile/8 to itself be a lane
    # multiple (Mosaic rejects the shape cast otherwise), so the tile is a
    # multiple of 1024: npad=384 (the 117-atom north star) -> 1024, not 1365.
    return max(1024, (tile * 128 // npad) // 1024 * 1024)


# default grid-tile request: npad=128 -> 4096-point tiles, npad=256 ->
# 2048 (16 MB/plane-set, double-buffered, inside the 48 MB VMEM budget).
# Measured DHA sweep: 1024 -> 6.28 ms, 2048 -> 5.92, 4096 -> 5.76 ms/call
DEFAULT_TILE = 4096


@functools.partial(jax.jit, static_argnames=("npad", "gpad"))
def _pack_plane(plane, npad: int, gpad: int):
    g, n = plane.shape
    return (jnp.zeros((npad, gpad), jnp.float32)
            .at[:n, :g].set(plane.astype(jnp.float32).T))


@functools.partial(jax.jit, static_argnames=("tile", "n_grad"))
def pack_pallas_inputs(ao, weights, ao_grad=None, tile: int = DEFAULT_TILE,
                       n_grad: bool = False):
    """One-time f32 transpose/pad of the grid-plane inputs -> (aot, wt,
    grads_t).  The SCF hot loop reuses these across iterations instead of
    re-casting ~GBs of f64 AO planes per XC call (at DHA scale the cast +
    transpose cost ~10 ms/call of pure HBM traffic)."""
    g, n = ao.shape
    npad = _npad_for(n)
    t = _tile_for(npad, tile)
    gpad = _round_up(g, t)
    f32 = jnp.float32
    aot = _pack_plane(ao, npad, gpad)
    wt = jnp.zeros((1, gpad), f32).at[0, :g].set(weights.astype(f32))
    grads = None
    if n_grad:
        grads = tuple(_pack_plane(ao_grad[k], npad, gpad) for k in range(3))
    return aot, wt, grads



@functools.partial(
    jax.jit, static_argnames=("functional", "tile", "n", "phi_split")
)
def xc_step_pallas_packed(
    functional: Functional,
    dm: jnp.ndarray,
    aot: jnp.ndarray,
    wt: jnp.ndarray,
    grads_t,
    n: int,
    tile: int = DEFAULT_TILE,
    phi_split: bool = False,
):
    """XC build from pre-packed (pack_pallas_inputs) transposed planes."""
    npad, gpad = aot.shape
    t = _tile_for(npad, tile)
    f32 = jnp.float32
    dm_p = jnp.zeros((npad, npad), f32).at[:n, :n].set(dm.astype(f32))
    ones_row = jnp.zeros((1, npad), f32).at[0, :n].set(1.0)
    kernel = _make_kernel(functional, npad, phi_split=phi_split)
    grid_in = [
        pl.BlockSpec((npad, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((npad, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [dm_p, aot, wt]
    if functional.needs_grad:
        for k in range(3):
            args.append(grads_t[k])
            grid_in.append(
                pl.BlockSpec((npad, t), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
            )
    args.append(ones_row)
    grid_in.append(
        pl.BlockSpec((1, npad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    with jax.enable_x64(False):
        e_out, v_out = pl.pallas_call(
            kernel,
            grid=(gpad // t,),
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit(
                    npad, t, functional.needs_grad),
            ),
        )(*args)
    v = v_out[:n, :n].astype(dm.dtype)
    return e_out[0, 0].astype(dm.dtype), 0.5 * (v + v.T)


def _vmem_limit(npad: int, tile: int, needs_grad: bool) -> int:
    """Scoped-VMEM budget: the 48 MB default covers every ladder shape,
    but large-tile A/B configs (DFT_PALLAS_TILE) need streamed planes
    double-buffered plus ~6 plane-sized temporaries -- scale the budget
    with the working set, capped at 110 of v5e's 128 MB."""
    planes = 4 if needs_grad else 1
    need = (2 * planes + 6) * npad * tile * 4 + 16 * 2**20
    return min(110 * 2**20, max(48 * 2**20, need))


@functools.partial(
    jax.jit, static_argnames=("functional", "tile", "phi_split")
)
def xc_step_pallas(
    functional: Functional,
    dm: jnp.ndarray,
    ao: jnp.ndarray,
    weights: jnp.ndarray,
    ao_grad: Optional[jnp.ndarray] = None,
    tile: int = DEFAULT_TILE,
    phi_split: bool = False,
):
    """Fused-tile XC build, f32: -> (E_xc, V_xc) with the same contract as
    engine.xc_engine.xc_step."""
    g, n = ao.shape
    npad = _npad_for(n)
    tile = _tile_for(npad, tile)
    gpad = _round_up(g, tile)

    f32 = jnp.float32
    # transposed layout: (npad, gpad) planes, grid axis on lanes
    ao_p = jnp.zeros((npad, gpad), f32).at[:n, :g].set(ao.astype(f32).T)
    w_p = jnp.zeros((1, gpad), f32).at[0, :g].set(weights.astype(f32))
    dm_p = jnp.zeros((npad, npad), f32).at[:n, :n].set(dm.astype(f32))
    ones_row = jnp.zeros((1, npad), f32).at[0, :n].set(1.0)

    n_tiles = gpad // tile
    kernel = _make_kernel(functional, npad, phi_split=phi_split)

    grid_in = [
        pl.BlockSpec((npad, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((npad, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [dm_p, ao_p, w_p]
    if functional.needs_grad:
        for k in range(3):
            gk = jnp.zeros((npad, gpad), f32).at[:n, :g].set(
                ao_grad[k].astype(f32).T
            )
            args.append(gk)
            grid_in.append(
                pl.BlockSpec((npad, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
            )
    args.append(ones_row)
    grid_in.append(
        pl.BlockSpec((1, npad), lambda i: (0, 0), memory_space=pltpu.VMEM)
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
            # (DHA-sized nao); v5e has 128 MB of VMEM (see _vmem_limit)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit(
                    npad, tile, functional.needs_grad),
            ),
        )(*args)

    v = v_out[:n, :n].astype(dm.dtype)
    return e_out[0, 0].astype(dm.dtype), 0.5 * (v + v.T)
