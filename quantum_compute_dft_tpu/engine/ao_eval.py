"""AO values (and gradients) at grid points.

Native replacement for PySCF's ``numint.eval_ao`` with deriv=0/1 used by
the reference (ref grid.py:30-31,38).  Evaluates the flat primitive-term
table from basis_set.py:

    phi_ao(r) = sum_t  w[ao,t] * dx^px dy^py dz^pz * exp(-alpha[ao,t] |d|^2)

with d = r - center[ao] -- pure elementwise/broadcast work that XLA maps
onto the VPU; the Pallas performance path (engine/pallas_xc.py) fuses the
same table evaluation into the XC pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from quantum_compute_dft_tpu.basis.basis_set import BasisSet


_PMAX = 5  # max monomial power needed (l=4 aux) + 1 for gradients


def _int_pow(base, p):
    """base ** p for a traced small-integer array p, via select over chained
    multiplications.  jnp's float pow lowers to exp(p log base) on TPU,
    which is NaN for the negative displacements that dominate a grid."""
    out = jnp.ones_like(base)
    acc = jnp.ones_like(base)
    for k in range(1, _PMAX + 1):
        acc = acc * base
        out = jnp.where(p == k, acc, out)
    return out


@functools.partial(jax.jit, static_argnames=("with_grad",))
def _eval_chunk(coords, centers, powers, alphas, weights, with_grad: bool):
    # coords (G,3); centers (nao,3); powers (nao,T,3); alphas/weights (nao,T)
    d = coords[:, None, :] - centers[None, :, :]          # (G, nao, 3)
    r2 = jnp.sum(d * d, axis=-1)                          # (G, nao)
    arg = -alphas[None, :, :] * r2[:, :, None]            # (G, nao, T)
    # exp underflow on TPU float-float (f32 exponent range) yields NaN, not
    # 0 -- cut the tail explicitly (exp(-85) ~ 1e-37 is already nothing)
    ex = jnp.where(arg > -85.0, jnp.exp(jnp.maximum(arg, -85.0)), 0.0)

    p = powers[None, :, :, :]                             # (1, nao, T, 3)
    dxyz = d[:, :, None, :]                               # (G, nao, 1, 3)
    mono = jnp.prod(_int_pow(dxyz, p), axis=-1)           # (G, nao, T)
    w = weights[None, :, :]
    ao = jnp.sum(w * mono * ex, axis=-1)                  # (G, nao)
    if not with_grad:
        return ao, None

    # d/dk of each term: (p_k d_k^{p_k-1} - 2 a d_k^{p_k+1}) * (other dims)
    grads = []
    pm1 = jnp.maximum(p - 1, 0)
    for k in range(3):
        dk = dxyz[..., k]
        poly_dk = jnp.where(p[..., k] > 0, p[..., k] * _int_pow(dk, pm1[..., k]), 0.0)
        other = jnp.prod(
            jnp.stack(
                [_int_pow(dxyz[..., m], p[..., m]) for m in range(3) if m != k],
                -1,
            ),
            axis=-1,
        )
        dmono = (poly_dk - 2.0 * alphas[None] * _int_pow(dk, p[..., k] + 1)) * other
        grads.append(jnp.sum(w * dmono * ex, axis=-1))
    return ao, jnp.stack(grads)                           # (G,nao), (3,G,nao)


def device_tables(basis: "BasisSet"):
    """Small device-resident basis tables consumed by _eval_chunk --
    the streamed-AO XC path (engine.xc_engine.xc_step_onfly) carries
    these (~1 MB) instead of the multi-GB (ngrid, nao) planes."""
    return (jnp.asarray(basis.ao_centers), jnp.asarray(basis.term_powers),
            jnp.asarray(basis.term_alphas), jnp.asarray(basis.term_weights))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("chunk",))
def _write_rows(buf, val, i, chunk: int):
    z = jnp.zeros((), i.dtype)
    return jax.lax.dynamic_update_slice(buf, val, (i * chunk, z))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("chunk",))
def _write_rows3(buf, val, i, chunk: int):
    z = jnp.zeros((), i.dtype)
    return jax.lax.dynamic_update_slice(buf, val, (z, i * chunk, z))


@functools.partial(jax.jit, static_argnames=("with_grad",))
def _eval_chunk_jit(coords, centers, powers, alphas, weights,
                    with_grad: bool):
    return _eval_chunk(coords, centers, powers, alphas, weights, with_grad)


def eval_planes_scan(coords_pad, tables, needs_grad: bool, chunk: int,
                     split_grad: bool = False):
    """Materialize full f64 AO (+grad) planes on device with peak HBM of
    planes + ONE chunk's temporaries: each chunk write DONATES the
    output buffer (guaranteed in-place; a lax.scan carry was measured to
    double-buffer the 6.5 GB plane set at north-star scale, as did the
    eval_ao concatenate path).  coords_pad must be a chunk multiple
    (caller zero-pads); returns (ao (G, nao), grad (3, G, nao) | None).

    The host loop costs ~3 enqueues per chunk over the TPU tunnel
    (~25 ms each) -- a few seconds per materialization, which happens
    O(1) times per SCF."""
    centers, powers, alphas, tweights = tables
    nc = coords_pad.shape[0] // chunk
    nao = centers.shape[0]
    ao = jnp.zeros((nc * chunk, nao), jnp.float64)
    if not needs_grad:
        grad = None
    elif split_grad:
        # three separate (G, nao) buffers: downstream per-plane packing
        # then avoids the 1.6 GB slice-copy transient of grad[k] on the
        # stacked buffer, and each buffer can free right after its pack
        grad = [jnp.zeros((nc * chunk, nao), jnp.float64)
                for _ in range(3)]
    else:
        grad = jnp.zeros((3, nc * chunk, nao), jnp.float64)
    for i in range(nc):
        a, g = _eval_chunk_jit(
            jax.lax.dynamic_slice(coords_pad, (i * chunk, 0), (chunk, 3)),
            centers, powers, alphas, tweights, needs_grad,
        )
        ao = _write_rows(ao, a, jnp.int32(i), chunk)
        if needs_grad and split_grad:
            for k in range(3):
                grad[k] = _write_rows(grad[k], g[k], jnp.int32(i), chunk)
        elif needs_grad:
            grad = _write_rows3(grad, g, jnp.int32(i), chunk)
    return ao, grad


def eval_ao(
    basis: BasisSet,
    coords: np.ndarray,
    deriv: int = 0,
    chunk: int = 16384,
    as_numpy: bool = True,
):
    """-> ao (ngrid, nao) [deriv=0] or (ao, ao_grad (3, ngrid, nao)) [deriv=1].

    ao_grad uses the reference's planar layout (ref dft.py:136-142).
    as_numpy=False keeps the chunks on the accelerator and concatenates
    there -- vital on this TPU, where the host<->device relay moves only
    ~10 MB/s (a DHA-sized AO+grad set is ~5 GB)."""
    centers = jnp.asarray(basis.ao_centers)
    powers = jnp.asarray(basis.term_powers)
    alphas = jnp.asarray(basis.term_alphas)
    weights = jnp.asarray(basis.term_weights)

    n = coords.shape[0]
    aos, gs = [], []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        ao, g = _eval_chunk(
            jnp.asarray(coords[s:e]), centers, powers, alphas, weights,
            deriv >= 1,
        )
        aos.append(np.asarray(ao) if as_numpy else ao)
        if deriv >= 1:
            gs.append(np.asarray(g) if as_numpy else g)
    cat = np.concatenate if as_numpy else jnp.concatenate
    ao = cat(aos)
    if deriv == 0:
        return ao
    return ao, cat(gs, axis=1)
