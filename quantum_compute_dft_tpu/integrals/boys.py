"""Boys function F_m(x) = int_0^1 t^{2m} exp(-x t^2) dt in JAX, f64-exact.

The workhorse of Gaussian integral evaluation (nuclear attraction and ERIs;
the reference sidesteps it entirely by calling PySCF/libcint, ref
grid.py:61-65).  jax.scipy.special.gammainc only reaches ~2e-9 relative
accuracy, which is too coarse for 1e-6 Eh SCF parity, so this uses two
cancellation-free branches instead:

  * x < 12:  the all-positive-term series
        F_m(x) = exp(-x) * sum_k (2x)^k / ((2m+1)(2m+3)...(2m+2k+1))
    evaluated at the highest order, then the (stable) downward recursion
        F_{m-1} = (2x F_m + exp(-x)) / (2m - 1).
  * x >= 12: F_0(x) = 1/2 sqrt(pi/x) erf(sqrt(x)) via jax erf (machine
    precision), then the upward recursion
        F_{m+1} = ((2m+1) F_m - exp(-x)) / (2x),
    which is stable in this regime (no significant cancellation for
    x > m + ~4 with m <= 12).

Max rel error vs mpmath-grade reference: < 4e-15 over x in [0, 1e6],
m <= 12 (tests/test_integrals.py).
"""

from __future__ import annotations

from math import pi, sqrt

import jax.numpy as jnp
from jax.scipy.special import erf

_SWITCH = 12.0
_NSERIES = 110  # terms: at x=12 the positive series needs ~80 for 1e-17 tail


def _boys_small(mmax: int, x: jnp.ndarray) -> jnp.ndarray:
    """Highest order via positive series, valid for x <= _SWITCH."""
    # sum_k (2x)^k / prod_{j=0..k} (2m+2j+1), Horner from the tail.
    acc = jnp.zeros_like(x)
    for k in range(_NSERIES, 0, -1):
        acc = (1.0 + acc) * (2.0 * x) / (2 * mmax + 2 * k + 1)
    acc = (1.0 + acc) / (2 * mmax + 1)
    return jnp.exp(-x) * acc


_TABLE_CACHE: dict[int, "jnp.ndarray"] = {}
_TABLE_DX = 0.0625       # grid spacing; 7-term Taylor -> ~1e-14 truncation
_TABLE_XMAX = 12.0
_TABLE_TERMS = 7


def _taylor_table(mmax: int):
    """Host-precomputed F_m(x_i) for the in-kernel Taylor expansion.

    Built with numpy/scipy (not jax) so it stays concrete even when the
    first boys_fast call happens inside a jit trace."""
    key = mmax
    if key not in _TABLE_CACHE:
        import numpy as np
        from math import gamma as _gamma
        from scipy.special import gammainc as _gammainc

        xs = np.arange(0.0, _TABLE_XMAX + _TABLE_DX * 1.5, _TABLE_DX)
        morders = mmax + _TABLE_TERMS
        tab = np.empty((morders + 1, len(xs)))
        small = xs < 1e-12
        for m in range(morders + 1):
            tab[m, small] = 1.0 / (2 * m + 1)
            xl = xs[~small]
            tab[m, ~small] = (
                _gamma(m + 0.5) * _gammainc(m + 0.5, xl)
                / (2.0 * xl ** (m + 0.5))
            )
        _TABLE_CACHE[key] = tab  # numpy: caching a traced jnp constant
        #                          would leak tracers across jit traces
    return jnp.asarray(_TABLE_CACHE[key])


def boys_fast(mmax: int, x: jnp.ndarray) -> jnp.ndarray:
    """Table-driven Boys function, ~1e-13 accurate -- the hot-path variant
    for ERI quartets (the exact series costs ~110 fused ops per element;
    this costs ~10 plus one small gather).

    x < 12:  7-term Taylor around the nearest table node
             F_m(x) = sum_k (x_i - x)^k / k! * F_{m+k}(x_i)
             (dF_m/dx = -F_{m+1}), then downward recursion.
    x >= 12: erf closed form + upward recursion (as in boys()).
    """
    x = jnp.asarray(x)
    tab = _taylor_table(mmax)
    xs = jnp.minimum(x, _TABLE_XMAX)
    idx = jnp.round(xs / _TABLE_DX).astype(jnp.int32)
    x_i = idx.astype(x.dtype) * _TABLE_DX
    dx = x_i - xs
    cols = tab[:, idx]                      # (mmax+TERMS+1, ...) gather
    # Horner over sum_k dx^k/k! * F_{mmax+k}(x_i)
    top = cols[mmax + _TABLE_TERMS]
    for k in range(_TABLE_TERMS - 1, -1, -1):
        top = cols[mmax + k] + top * dx / (k + 1)
    emxs = jnp.exp(-xs)
    small = [top]
    for m in range(mmax, 0, -1):
        small.append((2.0 * xs * small[-1] + emxs) / (2 * m - 1))
    small = small[::-1]

    xl = jnp.maximum(x, _TABLE_XMAX)
    sx = jnp.sqrt(xl)
    large = [0.5 * sqrt(pi) / sx * erf(sx)]
    emxl = jnp.exp(-xl)
    for m in range(mmax):
        large.append(((2 * m + 1) * large[-1] - emxl) / (2.0 * xl))

    cond = x < _TABLE_XMAX
    return jnp.stack([jnp.where(cond, s, l) for s, l in zip(small, large)])


def boys(mmax: int, x: jnp.ndarray) -> jnp.ndarray:
    """All orders 0..mmax of F_m(x); returns shape (mmax+1,) + x.shape."""
    x = jnp.asarray(x)
    emx = jnp.exp(-x)

    # --- small-x branch: series at mmax, downward recursion ---
    xs = jnp.minimum(x, _SWITCH)  # keep unused lanes finite
    emxs = jnp.exp(-xs)
    small = [_boys_small(mmax, xs)]
    for m in range(mmax, 0, -1):
        small.append((2.0 * xs * small[-1] + emxs) / (2 * m - 1))
    small = small[::-1]  # index m

    # --- large-x branch: erf closed form at m=0, upward recursion ---
    xl = jnp.maximum(x, _SWITCH)
    sx = jnp.sqrt(xl)
    large = [0.5 * sqrt(pi) / sx * erf(sx)]
    emxl = jnp.exp(-xl)
    for m in range(mmax):
        large.append(((2 * m + 1) * large[-1] - emxl) / (2.0 * xl))

    del emx
    cond = x < _SWITCH
    return jnp.stack([jnp.where(cond, s, l) for s, l in zip(small, large)])
