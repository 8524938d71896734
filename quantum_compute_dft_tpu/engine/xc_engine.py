"""XC engine: density on the grid, E_xc, and the V_xc matrix.

The TPU-native replacement for the reference's CUDA ``XCSolver`` pipeline
(ref src/dft_solver.cu:559-672):

    rho_g   = sum_uv D_uv phi_u(g) phi_v(g)        (get_rho_kernel :294-307)
    grad-rho, sigma for GGAs                       (get_rho_sigma_... :346-380)
    e_g     = rho_g * eps_xc(rho_g, sigma_g)       (the *_fused_kernel family)
    E_xc    = sum_g w_g e_g                        (reduce_sum_kernel :285-292)
    B_gi    = w_g (vrho_g phi_i + 2 vsigma_g grad-rho . grad-phi_i)
    V_xc    = phi^T B, symmetrized                 (cublasDgemm :580,616,663)

Here everything is jnp: rho via (phi @ D) . phi row-dots and V_xc as one
MXU GEMM; XLA fuses the elementwise functional into the pipeline.  The
whole step is jit-compiled and differentiable.  A Pallas fused-tile
variant lives in engine/pallas_xc.py.

Unlike the reference (which builds an asymmetric V then symmetrizes,
:515-527 + ref dft.py:212), the B matrix here uses the symmetric form
directly; results agree to roundoff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from quantum_compute_dft_tpu.xc.functionals import Functional


_NT = (((1,), (1,)), ((), ()))  # dot_general: contract last dim of both


def _xc_block_f64_fast(functional: Functional, dm, aot, wt, grt,
                       want_v: bool = True):
    """(E_xc, V_half) of one grid block with the round-4 anchor split:
    the DENSITY pipeline (phi_D, rho, grad-rho, sigma, functional,
    E_xc reduction) stays exact f64, while the B assembly and the V GEMM
    run in f32 at HIGHEST precision on the MXU.

    Why this is the right f64 engine for the delta-tail anchor role
    (scf.driver): the anchor's E_xc must be parity-grade (it is -- the
    f64 density pipeline is bitwise the xc_step one), but the anchor's
    V_xc only sets the point the f32 increments refine AROUND -- a
    ~1e-7-relative V error shifts the converged density by O(eps) and
    the final (exact-f64, energy-only) evaluation by O(eps^2) ~ 1e-14.
    The V GEMM was half the f64 matmul FLOPs and the f64 B assembly
    most of the emulated elementwise cost: measured at DHA shape this
    cuts the per-call cost ~4x (1095 -> ~270 ms; BENCH_r04), vs the
    reference engine that is f64 throughout (ref src/dft_solver.cu:57).
    """
    f32 = jnp.float32
    H = jax.lax.Precision.HIGHEST
    phi_d = dm @ aot                               # (nao, g) f64 matmul
    rho = jnp.sum(phi_d * aot, axis=0)             # (g,) f64
    aot32 = aot.astype(f32)
    if functional.needs_grad:
        # grad-rho via a two-term compensated f32 split: hi*hi products
        # plus both first-order cross terms, each an f32 elementwise-
        # reduce (the pure-f64 einsum was ~2/3 of the whole f64 XC cost
        # at DHA -- 336 of 518 ms -- at ~5 GFLOP/s of emulated float-
        # float VPU work).  The split restores the product truncation
        # exactly; the residual is the f32 ACCUMULATION rounding of the
        # nao-length reduction, ~sqrt(nao)*2^-24 ~ 1e-6 relative on
        # grad_rho, entering E_xc only through the (small) vsigma terms
        # as a smooth deterministic ~1e-8 shift (measured at DHA:
        # |dE_xc| = 4e-9 vs the exact engine; BENCH_r04) -- absorbed by
        # the delta-tail contract exactly like the f32 V below.
        ph = phi_d.astype(f32)
        plo = (phi_d - ph).astype(f32)
        gh = grt.astype(f32)
        glo = (grt - gh).astype(f32)
        # precision=HIGHEST: the compensated split's ~1e-6 grad_rho
        # budget assumes EXACT f32 products; if XLA ever lowered these
        # batched contractions onto the MXU at DEFAULT (bf16) precision,
        # product truncation would silently break the 1e-9 E_xc anchor
        # contract.  Pin them like the V GEMM below.
        main = jnp.einsum("kng,ng->kg", gh, ph, precision=H)
        cross = (jnp.einsum("kng,ng->kg", gh, plo, precision=H)
                 + jnp.einsum("kng,ng->kg", glo, ph, precision=H))
        grad_rho = 2.0 * (main.astype(jnp.float64)
                          + cross.astype(jnp.float64))
        sigma = jnp.sum(grad_rho * grad_rho, axis=0)
        e, vrho, vsigma = functional.exc_vxc(rho, sigma)        # f64
        exc = wt @ e
        gdot = jnp.einsum("kg,kng->ng", grad_rho.astype(f32), gh,
                          precision=H)
        bt = wt.astype(f32)[None, :] * (
            vrho.astype(f32)[None, :] * aot32
            + 2.0 * vsigma.astype(f32)[None, :] * gdot
        )
    else:
        e, vrho, _ = functional.exc_vxc(rho)
        exc = wt @ e
        bt = (wt * vrho).astype(f32)[None, :] * aot32
    v_half = jax.lax.dot_general(aot32, bt, _NT, precision=H,
                                 preferred_element_type=f32)
    return exc, v_half.astype(dm.dtype)


def _xc_block(functional: Functional, dm, aot, wt, grt, want_v: bool = True):
    """(E_xc, V_half) contribution of one grid block -- TRANSPOSED
    (nao, g) layout.  want_v=False skips the B assembly and the V GEMM
    (the energy-only path of energy_of_dm's final f64 evaluation).

    Measured on v5e (benzene GGA, f64): the original (g, nao) layout ran
    the elementwise/reduction einsums at ~0.6 GFLOP/s-f64 -- nao=36 of
    128 lanes used, plus cross-lane reductions -- for 101 ms/call, while
    f64 matmuls hit 18 GFLOP/s.  Transposed, everything elementwise
    vectorizes along the packed grid axis and the AO-axis reductions are
    sublane sums: 23.7 ms/call (4.3x), identical results to 2e-11."""
    phi_d = dm @ aot                               # (nao, g) f64 matmul
    rho = jnp.sum(phi_d * aot, axis=0)             # (g,)

    if functional.needs_grad:
        # grad rho_k = 2 sum_uv D_uv dphi_u/dk phi_v  (D symmetric)
        grad_rho = 2.0 * jnp.einsum("kng,ng->kg", grt, phi_d)  # (3, g)
        sigma = jnp.sum(grad_rho * grad_rho, axis=0)
        e, vrho, vsigma = functional.exc_vxc(rho, sigma)
        exc = wt @ e
        if not want_v:
            return exc, None
        # B_gi = w (vrho phi_i + 2 vsigma grad-rho . grad-phi_i)
        gdot = jnp.einsum("kg,kng->ng", grad_rho, grt)
        bt = wt[None, :] * (
            vrho[None, :] * aot + 2.0 * vsigma[None, :] * gdot
        )
    else:
        e, vrho, _ = functional.exc_vxc(rho)
        exc = wt @ e
        if not want_v:
            return exc, None
        bt = (wt * vrho)[None, :] * aot

    # contract the shared grid axis of two (nao, g) operands (MXU GEMM)
    return exc, jax.lax.dot_general(aot, bt, _NT)


_XC_CHUNK = 32768


def _xc_scan(functional: Functional, dm, ao, weights, ao_grad,
             want_v: bool, block=None):
    """Shared chunked driver for xc_step / xc_energy: transpose to the
    (nao, g) layout, then lax.scan over fixed-size grid chunks -- the
    unchunked f64 pipeline materializes multi-GB (3, ngrid, nao)
    temporaries at DHA scale (measured 20 GB on a 16 GB chip); the scan
    bounds temporaries to one chunk, exactly like the Pallas tiling."""
    block = block or _xc_block
    g, n = ao.shape
    aot = ao.T
    grt = None if ao_grad is None else jnp.swapaxes(ao_grad, 1, 2)
    if g <= 2 * _XC_CHUNK:
        return block(functional, dm, aot, weights, grt, want_v=want_v)

    c = _XC_CHUNK
    pad = (-g) % c
    ao_p = jnp.pad(aot, ((0, 0), (0, pad))).reshape(n, -1, c)
    ao_p = jnp.moveaxis(ao_p, 1, 0)                       # (nc, nao, c)
    w_p = jnp.pad(weights, (0, pad)).reshape(-1, c)
    if functional.needs_grad:
        g_p = jnp.pad(grt, ((0, 0), (0, 0), (0, pad)))
        g_p = g_p.reshape(3, n, -1, c)
        g_p = jnp.moveaxis(g_p, 2, 0)                     # (nc, 3, nao, c)
    else:
        g_p = jnp.zeros((ao_p.shape[0], 0))

    def body(carry, blk):
        exc_acc, v_acc = carry
        ao_b, w_b, gr_b = blk
        exc, v_half = block(
            functional, dm, ao_b, w_b,
            gr_b if functional.needs_grad else None, want_v=want_v,
        )
        return (exc_acc + exc,
                v_acc + v_half if want_v else v_acc), None

    zero = jnp.zeros((), dm.dtype)
    (exc, v_half), _ = jax.lax.scan(
        body, (zero, jnp.zeros_like(dm)), (ao_p, w_p, g_p)
    )
    return exc, (v_half if want_v else None)


_ONFLY_CHUNK = 8192


def _xc_scan_onfly(functional: Functional, dm, coords, weights, tables,
                   want_v: bool, block=None):
    """Streamed variant of _xc_scan: the f64 AO values (and gradients)
    are evaluated ON DEVICE per grid chunk inside the scan body instead
    of being read from persistent (ngrid, nao) planes.  At the 117-atom
    north-star scale the f64 AO+grad planes are ~6.5 GB of HBM that the
    anchor/final-parity evaluations only touch O(1) times per SCF --
    recomputing them chunk-wise (identical _eval_chunk math, so the AO
    values are bitwise those of the plane path) trades a few seconds per
    anchor for the headroom that lets grid level 1+ fit on one chip.

    tables = (centers, powers, alphas, term_weights) device arrays from
    ao_eval.device_tables.  Padded grid rows carry zero quadrature
    weight, so both the energy and the B-matrix contributions vanish."""
    from quantum_compute_dft_tpu.engine.ao_eval import _eval_chunk

    block = block or _xc_block
    centers, powers, alphas, tweights = tables
    g = coords.shape[0]
    c = _ONFLY_CHUNK
    pad = (-g) % c
    crd = jnp.pad(coords, ((0, pad), (0, 0))).reshape(-1, c, 3)
    w_p = jnp.pad(weights, (0, pad)).reshape(-1, c)

    def body(carry, blk):
        exc_acc, v_acc = carry
        crd_b, w_b = blk
        ao_b, gr_b = _eval_chunk(crd_b, centers, powers, alphas, tweights,
                                 functional.needs_grad)
        grt = None if gr_b is None else jnp.swapaxes(gr_b, 1, 2)
        exc, v_half = block(functional, dm, ao_b.T, w_b, grt,
                            want_v=want_v)
        return (exc_acc + exc,
                v_acc + v_half if want_v else v_acc), None

    zero = jnp.zeros((), dm.dtype)
    (exc, v_half), _ = jax.lax.scan(body, (zero, jnp.zeros_like(dm)),
                                    (crd, w_p))
    return exc, (v_half if want_v else None)


@functools.partial(jax.jit, static_argnames=("functional",))
def xc_step_onfly(functional: Functional, dm, coords, weights, tables):
    """xc_step with on-device streamed AO evaluation (see _xc_scan_onfly)."""
    exc, v_half = _xc_scan_onfly(functional, dm, coords, weights, tables,
                                 want_v=True)
    return exc, 0.5 * (v_half + v_half.T)


@functools.partial(jax.jit, static_argnames=("functional",))
def xc_step_onfly_fast(functional: Functional, dm, coords, weights, tables):
    """Streamed-AO xc_step with the anchor-grade split (_xc_block_f64_fast):
    the lean-AO counterpart of xc_step_f64_fast, for delta-tail anchors
    and delta64 endgame cycles at north-star scale where no persistent
    f64 planes exist."""
    exc, v_half = _xc_scan_onfly(functional, dm, coords, weights, tables,
                                 want_v=True, block=_xc_block_f64_fast)
    return exc, 0.5 * (v_half + v_half.T)


@functools.partial(jax.jit, static_argnames=("functional",))
def xc_energy_onfly(functional: Functional, dm, coords, weights, tables):
    """xc_energy with on-device streamed AO evaluation."""
    exc, _ = _xc_scan_onfly(functional, dm, coords, weights, tables,
                            want_v=False)
    return exc


@functools.partial(jax.jit, static_argnames=("functional",))
def xc_step(
    functional: Functional,
    dm: jnp.ndarray,          # (nao, nao)
    ao: jnp.ndarray,          # (ngrid, nao)
    weights: jnp.ndarray,     # (ngrid,)
    ao_grad: jnp.ndarray | None = None,   # (3, ngrid, nao) planar layout
):
    """-> (E_xc scalar, V_xc (nao, nao) symmetric).  See _xc_scan."""
    exc, v_half = _xc_scan(functional, dm, ao, weights, ao_grad,
                           want_v=True)
    return exc, 0.5 * (v_half + v_half.T)


@functools.partial(jax.jit, static_argnames=("functional",))
def xc_step_f64_fast(
    functional: Functional,
    dm: jnp.ndarray,
    ao: jnp.ndarray,
    weights: jnp.ndarray,
    ao_grad: jnp.ndarray | None = None,
):
    """xc_step with the anchor-grade split (_xc_block_f64_fast): exact
    f64 E_xc/density pipeline + f32-HIGHEST V GEMM.  ~4x cheaper than
    xc_step at DHA shape; used by the staged driver for delta-tail
    anchor evaluations, where V's ~1e-7 relative error perturbs the
    final energy only at O(eps^2)."""
    exc, v_half = _xc_scan(functional, dm, ao, weights, ao_grad,
                           want_v=True, block=_xc_block_f64_fast)
    return exc, 0.5 * (v_half + v_half.T)


@functools.partial(jax.jit, static_argnames=("functional",))
def xc_energy(
    functional: Functional,
    dm: jnp.ndarray,
    ao: jnp.ndarray,
    weights: jnp.ndarray,
    ao_grad: jnp.ndarray | None = None,
):
    """E_xc only (no V_xc matrix): skips the B assembly and the V GEMM --
    roughly half the f64 engine's cost at DHA scale.  Used for the final
    parity-grade energy evaluation (scf.driver.energy_of_dm), which
    never needs the potential."""
    exc, _ = _xc_scan(functional, dm, ao, weights, ao_grad, want_v=False)
    return exc
