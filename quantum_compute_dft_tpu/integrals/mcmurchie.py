"""McMurchie-Davidson machinery: Hermite expansion coefficients E and the
Hermite Coulomb tensor R, built by trace-time recursion with static angular
momentum bounds.

Everything here is written as a *uniform kernel over AO pairs*: the E/R
recursions are unrolled at trace time up to the molecule's maximum angular
momentum (static), and per-AO cartesian powers select rows via gathers.
That keeps one jitted program per (la_max, lb_max) instead of per shell
class -- the TPU-friendly formulation of what libcint does with code
generation per class (the reference outsources all of this to PySCF,
ref grid.py:61-65).
"""

from __future__ import annotations

import jax.numpy as jnp


def e_tables(imax: int, jmax: int, a, b, ab):
    """Hermite expansion coefficients for one dimension.

    Returns E with shape (imax+1, jmax+1, imax+jmax+1): E[i, j, t] is the
    coefficient of the Hermite Gaussian H_t in the product of cartesian
    powers x_A^i x_B^j; a, b are exponents, ab = A - B (this dimension).
    All entries built by the standard two-term-plus-transfer recursion,
    unrolled at trace time.
    """
    p = a + b
    mu = a * b / p
    x_pa = -b / p * ab   # P - A = -(b/p)(A-B)
    x_pb = a / p * ab    # P - B = +(a/p)(A-B)
    inv2p = 0.5 / p

    zero = jnp.zeros_like(p)
    memo = {(0, 0, 0): jnp.exp(-mu * ab * ab)}

    def E(i, j, t):
        if t < 0 or t > i + j or i < 0 or j < 0:
            return zero
        key = (i, j, t)
        if key in memo:
            return memo[key]
        if i > 0:
            val = (
                inv2p * E(i - 1, j, t - 1)
                + x_pa * E(i - 1, j, t)
                + (t + 1) * E(i - 1, j, t + 1)
            )
        else:
            val = (
                inv2p * E(i, j - 1, t - 1)
                + x_pb * E(i, j - 1, t)
                + (t + 1) * E(i, j - 1, t + 1)
            )
        memo[key] = val
        return val

    rows = []
    for i in range(imax + 1):
        cols = []
        for j in range(jmax + 1):
            cols.append(
                jnp.stack([E(i, j, t) for t in range(imax + jmax + 1)])
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (imax+1, jmax+1, tmax+1)


def hermite_combos(lmax_total: int):
    """All (t, u, v) with t+u+v <= lmax_total, in a fixed static order."""
    combos = []
    for t in range(lmax_total + 1):
        for u in range(lmax_total + 1 - t):
            for v in range(lmax_total + 1 - t - u):
                combos.append((t, u, v))
    return combos


def r_tensor(lmax_total: int, p, pc, boys_table):
    """Hermite Coulomb integrals R^0_{tuv}(p, PC) for t+u+v <= lmax_total.

    boys_table: precomputed F_n(p |PC|^2) for n = 0..lmax_total,
    shape (lmax_total+1,).  Returns dict {(t,u,v): value}.
    """
    zero = jnp.zeros_like(p)
    memo = {}

    def R(n, t, u, v):
        if t < 0 or u < 0 or v < 0:
            return zero
        key = (n, t, u, v)
        if key in memo:
            return memo[key]
        if t == u == v == 0:
            val = (-2.0 * p) ** n * boys_table[n]
        elif t > 0:
            val = (t - 1) * R(n + 1, t - 2, u, v) + pc[0] * R(n + 1, t - 1, u, v)
        elif u > 0:
            val = (u - 1) * R(n + 1, t, u - 2, v) + pc[1] * R(n + 1, t, u - 1, v)
        else:
            val = (v - 1) * R(n + 1, t, u, v - 2) + pc[2] * R(n + 1, t, u, v - 1)
        memo[key] = val
        return val

    return {tuv: R(0, *tuv) for tuv in hermite_combos(lmax_total)}
