"""Restricted Kohn-Sham SCF driver.

Native, fully-jitted replacement for the reference's Python SCF loop
(ref dft.py:199-266): same Fock assembly F = Hcore + J + V_xc - 0.5 c_hf K
(dft.py:221-223), same energy decomposition E_one/E_coul/E_xc/E_ex_hf/E_nuc
(dft.py:230-236), same convergence rule |dE| < 1e-8 and ||dD||_F < 1e-6
within 200 cycles (dft.py:199,243), same Hcore initial guess (dft.py:181).

Two entry points:
  * :func:`scf_host` -- host loop calling one jitted iteration; supports
    per-cycle callbacks for the reference-style console table.
  * :func:`scf_jit`  -- the whole SCF as one lax.while_loop under jit
    (zero host round-trips; the benchmarking / multi-chip path).

The generalized eigenproblem F C = S C e is solved by symmetric
orthogonalization X = S^(-1/2) + jnp.linalg.eigh, replacing scipy's
eigh(F, S) (ref dft.py:181,227).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from quantum_compute_dft_tpu.engine.xc_engine import xc_step
from quantum_compute_dft_tpu.engine.coulomb import coulomb_full, exchange_full
from quantum_compute_dft_tpu.scf.diis import (
    DIISState,
    adiis_init,
    adiis_update,
    diis_init,
    diis_update,
)
from quantum_compute_dft_tpu.xc.functionals import Functional

CONV_TOL_E = 1e-8    # ref dft.py:243
CONV_TOL_D = 1e-6
MAX_CYCLE = 200      # ref dft.py:199

# Oscillation guard: when ||dD|| stops decreasing while still large, the
# SCF is charge-sloshing between two states faster than DIIS can damp
# (observed: Acetaldehyde/LDA flips between -144.6 and -176.3 Eh forever).
# A half-step in the density breaks the 2-cycle; the fixed point is
# unchanged.  Only active while ||dD|| > DAMP_MIN_DNORM, so converged
# trajectories never see it.
DAMP_MIN_DNORM = 1.0
DAMP_RATIO = 0.9

# Level shifting: the tested convergence control for SCFs that stall or
# charge-slosh below the damping guard's radius (observed: HeH/LDA, a
# fractional-occupation doublet, approaches its fixed point then blows up
# when DIIS extrapolates across a level crossing at ||dD|| ~ 1e-3; and
# CuO/B3LYP, a d-shell doublet that charge-sloshes indefinitely).  When
# ||dD|| fails to improve by 10% for SHIFT_STALL consecutive cycles, a
# CONSTANT virtual-orbital shift F <- F + sigma (S - 1/2 S D S) engages
# (and the DIIS history resets -- its unshifted iterates no longer
# match).  The shift leaves the SCF fixed point unchanged -- it only
# moves virtuals up by sigma, separating the states whose crossing drives
# the oscillation -- so converged energies are identical.
#
# Once ENGAGED, the rules change (measured on CuO/B3LYP, which crawls
# smoothly downhill under the shift at <10%/cycle): DIIS must be left
# alone to accelerate the crawl, so escalation (x2 + DIIS reset) fires
# only on true NO-progress (no new ||dD|| best for SHIFT_STALL cycles) --
# the round-2 controller reset DIIS every 8 cycles of a converging
# trajectory and CuO never finished.  When ||dD|| drops below
# SHIFT_RELEASE the shift releases (sigma = 0, fresh DIIS) for the plain
# DIIS endgame; a recurring stall re-engages at the same sigma.
LEVEL_SHIFT = 0.5       # Eh; initial sigma
LEVEL_SHIFT_MAX = 4.0
SHIFT_STALL = 8         # non-improving cycles before (re-)engaging
SHIFT_MIN_DNORM = 1e-4  # below this DIIS is polishing; never engage
SHIFT_RELEASE = 1e-3    # engaged + ||dD|| below this -> hand back to DIIS
D64_REANCHOR_MAX = 6    # delta64 endgame: stall-triggered J/K re-anchor
                        # budget (each costs one f64 J + K build)
ADIIS_TO_CDIIS = 1e-2   # mixer='adiis+cdiis': ADIIS -> CDIIS handover
MIX_TO_CDIIS = 3e-3     # mixer='mix+cdiis': damped-mixing -> CDIIS handover


def _level_shift(f, dm, s, shift):
    """F + shift * S (I - 1/2 D S): moves virtuals up by `shift` Eh,
    fixed point unchanged (the occupied subspace of F is untouched)."""
    return f + shift * (s - 0.5 * s @ dm @ s)


class _ShiftController:
    """Host-side stall detector driving the level shift (see above)."""

    def __init__(self, nao: int):
        self.nao = nao
        self.shift = 0.0
        self._sigma = LEVEL_SHIFT  # (re-)engage magnitude
        self._dn_best = float("inf")
        self._stall = 0
        self.engaged_at = None  # cycle index, for tests/logs

    def update(self, cycle: int, dnorm: float):
        """Feed one cycle's ||dD||; returns a fresh DIIS state when the
        shift engages/escalates/releases (the caller must reset its
        history), else None."""
        if self.shift > 0.0:
            if dnorm < SHIFT_RELEASE:
                self.shift = 0.0
                self._stall = 0
                self._dn_best = dnorm
                return diis_init(self.nao)
            # escalate only on true no-progress; a slow smooth descent
            # must keep its DIIS history
            if dnorm < self._dn_best:
                self._dn_best = dnorm
                self._stall = 0
                return None
            self._stall += 1
            if self._stall >= SHIFT_STALL:
                self._sigma = min(2.0 * self._sigma, LEVEL_SHIFT_MAX)
                self.shift = self._sigma
                self._stall = 0
                self._dn_best = float("inf")
                return diis_init(self.nao)
            return None
        if dnorm < 0.9 * self._dn_best:
            self._dn_best = dnorm
            self._stall = 0
            return None
        self._stall += 1
        if self._stall >= SHIFT_STALL and dnorm > SHIFT_MIN_DNORM:
            self.shift = self._sigma
            if self.engaged_at is None:
                self.engaged_at = cycle
            self._stall = 0
            self._dn_best = float("inf")
            return diis_init(self.nao)
        return None


def _damp(dm_new, dm_old, dnorm, dnorm_prev):
    slosh = (dnorm > DAMP_MIN_DNORM) & (dnorm >= DAMP_RATIO * dnorm_prev)
    return jnp.where(slosh, 0.5 * (dm_new + dm_old), dm_new)


def _tpu_backend() -> bool:
    if os.environ.get("DFT_FORCE_SIGN_DENSITY") == "1":
        return True
    return jax.default_backend() not in ("cpu",)


def s_inv_sqrt(s: jnp.ndarray, lindep: float = 1e-12) -> jnp.ndarray:
    """Symmetric (Lowdin) orthogonalization S^(-1/2), linear-dependence safe.

    On TPU, XLA's f64 eigh only reaches f32-quality eigenvectors (measured
    residual ~8e-7), so the eigh result is polished by Newton-Schulz
    iterations X <- X(3I - S X^2)/2, whose f64 matmuls ARE exact on TPU;
    two steps take the error from ~1e-6 to roundoff (quadratic)."""
    w, v = jnp.linalg.eigh(s)
    w_safe = jnp.where(w > lindep, w, 1.0)
    inv_sqrt = jnp.where(w > lindep, 1.0 / jnp.sqrt(w_safe), 0.0)
    x = (v * inv_sqrt) @ v.T
    if _tpu_backend():
        eye = jnp.eye(s.shape[0], dtype=s.dtype)
        for _ in range(3):
            x = 0.5 * x @ (3.0 * eye - s @ (x @ x))
            x = 0.5 * (x + x.T)
    return x


@dataclasses.dataclass(frozen=True)
class SCFSystem:
    """Static per-molecule data for the SCF loop (device arrays)."""

    hcore: jnp.ndarray
    s: jnp.ndarray
    x: jnp.ndarray            # S^(-1/2)
    eri: jnp.ndarray | None   # (nao,)*4 in-core ERIs (None in DF mode)
    # f64 AO planes; None in lean-AO mode (large-scale TPU runs), where
    # the f64 XC evaluations stream on-device AO chunks from ao_tables
    # instead of holding ~(1+3)*ngrid*nao*8 bytes of HBM
    ao: jnp.ndarray | None    # (ngrid, nao)
    weights: jnp.ndarray      # (ngrid,)
    ao_grad: jnp.ndarray | None
    e_nuc: float
    nocc: int
    # singly-occupied orbital count (fractional-occupation RKS for
    # odd-electron systems; the reference crashes on these, ref grid.py:45)
    nopen: int = 0
    # density-fitting mode: jitted builders replacing the in-core eri paths
    df_coulomb: Callable | None = None
    df_exchange: Callable | None = None
    # f64 exchange for the parity tail (equals df_exchange unless the fast
    # variant auto-selected f32 at large scale)
    df_exchange_hi: Callable | None = None
    # fast-phase builders (f32-HIGHEST J, 3-pass bf16-split K): used far
    # from convergence and for delta increments, where their ~1e-5
    # relative error is absorbed (integrals/density_fitting.py)
    df_coulomb_fast: Callable | None = None
    df_exchange_fast: Callable | None = None
    # device-resident aux-major factors, passed as jit ARGUMENTS by the
    # fast/mixed cycle programs: builder closures embed their tensors as
    # compile-time constants, and programs embedding the multi-100-MB
    # factors exceed the remote-compile transport limit (HTTP 413 at
    # DHA scale for f64+f32 together; at north-star scale nao=377 even
    # the f32 planes alone)
    df_b64: jnp.ndarray | None = None   # aux-major f64 (smooth J)
    df_bq32: jnp.ndarray | None = None  # aux-major f32 (fast J/K)
    # raw DF tensors (host numpy), kept for the sharded multi-chip path
    # which re-shards them over the aux axis (parallel/sharded.py)
    df_j3c: object | None = None
    df_v2c: object | None = None
    # SAD initial-guess density (diag of atomic occupations); None -> Hcore
    dm_sad: jnp.ndarray | None = None
    # lean-AO mode: (coords (ngrid,3), ao_eval.device_tables(basis)) for
    # the streamed f64 XC path; set when ao is None
    ao_tables: tuple | None = None
    # shared-program mode (shape bucketing, scf/bucketing.py): when set,
    # the jitted cycle programs receive this VALUE-hashable key as their
    # static argument and the molecule tensors as a dynamic pytree
    # (_ArgSys) -- so two molecules padded to the same bucket shapes
    # reuse one compiled program instead of re-tracing (the identity
    # hash below bakes every tensor in as an HLO constant, which made
    # the 58-sweep pay 20-60 s of remote compiles PER MOLECULE,
    # docs/RESULTS.md round 3)
    shared_key: tuple | None = None

    def __hash__(self):  # static arg for jit: identity-based
        return id(self)

    def __eq__(self, other):
        return self is other


class _ArgSys:
    """Dynamic-tensor stand-in for SCFSystem inside SHARED jitted cycle
    programs (shape bucketing): the per-molecule tensors travel as jit
    ARGUMENTS (a registered pytree) instead of being baked into the HLO
    as constants, and ``nocc`` is a traced i32 scalar so one compiled
    program serves every molecule in the same shape bucket.  Exposes the
    same attribute names the cycle bodies read off SCFSystem; the
    DF-builder closures are None by construction (the shared path is
    in-core only -- DF molecules are large enough that per-molecule
    compiles are amortized)."""

    df_coulomb = None
    df_exchange = None
    df_exchange_hi = None
    df_coulomb_fast = None
    df_exchange_fast = None
    df_b64 = None
    df_bq32 = None
    df_j3c = None
    df_v2c = None
    dm_sad = None
    ao_tables = None
    shared_key = None

    def __init__(self, hcore, s, x, weights, e_nuc, nocc, eri=None,
                 ao=None, ao_grad=None, nopen=0):
        self.hcore = hcore
        self.s = s
        self.x = x
        self.weights = weights
        self.e_nuc = e_nuc
        self.nocc = nocc
        self.eri = eri
        self.ao = ao
        self.ao_grad = ao_grad
        self.nopen = nopen


jax.tree_util.register_pytree_node(
    _ArgSys,
    lambda a: ((a.hcore, a.s, a.x, a.weights, a.e_nuc, a.nocc, a.eri,
                a.ao, a.ao_grad), (a.nopen,)),
    lambda aux, ch: _ArgSys(ch[0], ch[1], ch[2], ch[3], ch[4], ch[5],
                            eri=ch[6], ao=ch[7], ao_grad=ch[8],
                            nopen=aux[0]),
)


import weakref as _weakref

_ARGSYS_CACHE: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def _sys_split(sys):
    """(static_arg, t_arg) for a jitted cycle call: identity-keyed
    SCFSystem and no tensor argument (classic mode), or the value-
    hashable shared_key plus the _ArgSys tensor pytree (shared mode).
    The jitted bodies resolve ``sys = t_arg if t_arg is not None else
    sys`` as their first step.  The pytree is cached per system so the
    e_nuc/nocc scalar device arrays are created once, not per cycle."""
    key = getattr(sys, "shared_key", None)
    if not key:
        return sys, None
    targ = _ARGSYS_CACHE.get(sys)
    if targ is None:
        targ = _ArgSys(
            sys.hcore, sys.s, sys.x, sys.weights,
            jnp.asarray(sys.e_nuc, jnp.float64),
            jnp.asarray(sys.nocc, jnp.int32),
            eri=sys.eri, ao=sys.ao, ao_grad=sys.ao_grad, nopen=sys.nopen,
        )
        _ARGSYS_CACHE[sys] = targ
    return key, targ


class EnergyBreakdown(NamedTuple):
    e_tot: jnp.ndarray
    e_one: jnp.ndarray
    e_coul: jnp.ndarray
    e_xc: jnp.ndarray
    e_ex_hf: jnp.ndarray


def make_system(hcore, s, eri, ao, weights, ao_grad, e_nuc, nocc,
                df_coulomb=None, df_exchange=None,
                df_j3c=None, df_v2c=None, df_exchange_hi=None,
                sad_occ=None, nopen=0,
                df_coulomb_fast=None, df_exchange_fast=None,
                df_b64=None, df_bq32=None, ao_tables=None) -> SCFSystem:
    f64 = jnp.float64
    return SCFSystem(
        hcore=jnp.asarray(hcore, f64),
        s=jnp.asarray(s, f64),
        x=s_inv_sqrt(jnp.asarray(s, f64)),
        eri=None if eri is None else jnp.asarray(eri, f64),
        ao=None if ao is None else jnp.asarray(ao, f64),
        weights=jnp.asarray(weights, f64),
        ao_grad=None if ao_grad is None else jnp.asarray(ao_grad, f64),
        e_nuc=float(e_nuc),
        nocc=int(nocc),
        nopen=int(nopen),
        df_coulomb=df_coulomb,
        df_exchange=df_exchange,
        df_exchange_hi=df_exchange_hi or df_exchange,
        df_coulomb_fast=df_coulomb_fast,
        df_exchange_fast=df_exchange_fast,
        df_b64=df_b64,
        df_bq32=df_bq32,
        df_j3c=df_j3c,
        df_v2c=df_v2c,
        dm_sad=None if sad_occ is None else jnp.diag(jnp.asarray(sad_occ, f64)),
        ao_tables=ao_tables,
    )


def _sign_projector_at(fp, w, cut, eye):
    """Projector onto the eigenspace of fp BELOW the scalar `cut` via the
    matrix sign function (Newton-Schulz f64 matmuls, exact on TPU) + two
    McWeeny idempotency sweeps.  `w` supplies the spectral bounds for the
    scale AND a lower bound on the cut distance for the dynamic scaling.
    A cut below w[0] yields 0, above w[-1] yields I (continuously), so
    window edges need no special-casing.

    Round 5: DYNAMICALLY SCALED Newton-Schulz with early exit.  The
    equioscillating scale g = sqrt(3/(1+l+l^2)) (the scaled-NS sign
    iteration of the polar-decomposition literature) maps the spectral
    interval [l, 1] of |a| to [l', 1] with l' = g l (3 - g^2 l^2)/2 --
    a ~2.6x per-iteration gain far from convergence where plain NS only
    gains 1.5x -- and the tracked lower bound l doubles as a CONVERGENCE
    CERTIFICATE: the lax.while_loop exits as soon as every eigenvalue is
    within 1e-4 of +-1 (the two McWeeny sweeps then polish 1e-4 ->
    ~1e-15, roundoff).  Typical DFT gaps (l ~ 1e-4..1e-3 of scale) need
    ~10-13 iterations instead of the previous fixed 30, halving the
    density build's f64-matmul count; the 34 cap still resolves
    l ~ 1e-7, BELOW the old fixed-30 resolution (~1e-5), so hard cases
    get sharper, not sloppier.  l is halved for eigenvalue-error safety
    (w is TPU-eigh-accurate, ~1e-8 relative; eigenvalues below the
    tracked l still converge -- just later, covered by the cap)."""
    scale = (
        jnp.maximum(jnp.abs(w[0] - cut), jnp.abs(w[-1] - cut)) * 1.05 + 1e-8
    )
    a = (cut * eye - fp) / scale
    l0 = jnp.maximum(0.5 * jnp.min(jnp.abs(w - cut)) / scale, 1e-8)

    def cond(state):
        _, l, k = state
        return (l < 1.0 - 1e-4) & (k < 34)

    def body(state):
        a, l, k = state
        g2 = 3.0 / (1.0 + l * (1.0 + l))
        g = jnp.sqrt(g2)
        a = 0.5 * g * (a @ (3.0 * eye - g2 * (a @ a)))
        l = 0.5 * g * l * (3.0 - g2 * l * l)
        return a, l, k + 1

    a, _, _ = jax.lax.while_loop(cond, body, (a, l0, 0))
    p = 0.5 * (eye + a)
    # two McWeeny sweeps clean residual non-idempotency quadratically
    for _ in range(2):
        p = p @ p @ (3.0 * eye - 2.0 * p)
    return p


def _sign_projector(fp, w, n, eye):
    """Projector onto the lowest-`n` eigenspace of fp; returns (P, gap)
    with gap the spectral separation at the cut."""
    mu = 0.5 * (w[n - 1] + w[n])
    gap = w[n] - w[n - 1]
    return _sign_projector_at(fp, w, mu, eye), gap


def _fermi_occ(w, mu, kt: float):
    """Occupations 2/(1+exp((w-mu)/kT)), overflow-stable: TPU 'f64' is
    float-float emulation with the f32 exponent RANGE, so exp arguments
    must stay <= 0 (exp(+88) would NaN where CPU f64 returns inf)."""
    t = (w - mu) / kt
    ex = jnp.exp(-jnp.abs(t))
    return jnp.where(t > 0.0, 2.0 * ex / (1.0 + ex), 2.0 / (1.0 + ex))


def _fermi_mu(w, nelec: float, kt: float):
    """Chemical potential: bisect mu so the smeared occupations sum to
    nelec.  Uses eigenvalues only (accurate on TPU: measured relative
    error ~7e-13 where the eigenVECTORS are only f32-quality)."""
    lo = w[0] - 10.0 * kt
    hi = w[-1] + 10.0 * kt

    def bisect(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        too_many = jnp.sum(_fermi_occ(w, mid, kt)) > nelec
        return (jnp.where(too_many, lo, mid), jnp.where(too_many, mid, hi))

    lo, hi = jax.lax.fori_loop(0, 80, bisect, (lo, hi))
    return 0.5 * (lo + hi)


# Fermi window: static window size (levels), cut-candidate count, and
# Chebyshev degree for the window matrix function (see
# _fermi_density_window).  Degree 1024 covers window spans up to
# ~230 kT (error ~ (1+pi/R)^-N at half-span-over-kT R); spans beyond
# that fall back to the raw-eigh density via the `ok` guard.
_FON_WINDOW_MAX = 32
_FON_CAND = 25  # wider cut search: dense valence spectra (ABAQ) need it
                # to find a gap the sign iteration can resolve
_FON_CHEB_DEG = 1024


def _cheb_fermi(hm, mu, kt: float, lo, hi):
    """f(H) = 2/(1+exp((H-mu)/kT)) as a degree-_FON_CHEB_DEG Chebyshev
    matrix polynomial on [lo, hi]: pure f64 matmuls (exact on TPU), no
    eigendecomposition.  Coefficients come from the node-value DCT with
    a compile-time cosine matrix; [lo, hi] and mu are runtime values."""
    import numpy as np

    m = hm.shape[0]
    n_deg = _FON_CHEB_DEG
    theta = np.pi * (np.arange(n_deg) + 0.5) / n_deg
    cosmat = jnp.asarray(
        np.cos(np.outer(np.arange(n_deg), theta)), dtype=hm.dtype
    )
    half = 0.5 * (hi - lo)
    midv = 0.5 * (hi + lo)
    nodes = midv + half * jnp.asarray(np.cos(theta), dtype=hm.dtype)
    coef = (2.0 / n_deg) * (cosmat @ _fermi_occ(nodes, mu, kt))
    coef = coef.at[0].mul(0.5)
    eye = jnp.eye(m, dtype=hm.dtype)
    a = (hm - midv * eye) / half

    def body(j, carry):
        tprev, tcur, acc = carry
        acc = acc + coef[j] * tcur
        return (tcur, 2.0 * (a @ tcur) - tprev, acc)

    _, _, acc = jax.lax.fori_loop(
        1, n_deg, body, (eye, a, coef[0] * eye)
    )
    return acc


def _fermi_density_window(x, fp, w, cp, mu, nelec: float, kt: float):
    """TPU-accurate FON density.  The raw eigh density is useless on TPU
    for tight convergence: XLA's f64 eigh eigenvectors carry ~1e-8*||F||
    residuals (measured), i.e. ~1e-5 density noise per cycle for a DFT
    Fock with core levels at -300 Eh -- the smeared SCF then never meets
    ||dD|| < 1e-6 at ANY kT.  Rebuild the density trusting only the
    (accurate) eigenvalues, in three f64-matmul-exact pieces:

      D' = 2 P_a  +  V f(H_m) V^T  +  C diag(docc) C^T

    * P_a: sign-function projector onto all levels below a contiguous
      m-level window around the Fermi index (fully occupied, weight 2).
    * V: the window's invariant subspace, extracted by the projector
      difference (P_b - P_a) applied to the approximate eigh vectors and
      re-orthonormalized; f(H_m) is the Fermi function of the small
      window Hamiltonian as a Chebyshev matrix polynomial (_cheb_fermi).
      The window cuts are placed at the largest spectral gaps among
      _FON_CAND candidate positions so the sign iterations stay sharp.
    * docc: occupancy DEVIATIONS of outside-window levels (occ-2 below,
      occ above).  These coefficients are <= the Fermi tail at the
      window edge, so the f32-quality eigh vectors C = x cp are fine
      here (error ~ docc * 1e-4 << 1e-8), and the density stays a
      SMOOTH function of F across window-placement changes.

    Falls back to the raw eigh density when the window span exceeds the
    Chebyshev budget or no clean cut gap exists."""
    n = fp.shape[0]
    m = (
        _FON_WINDOW_MAX
        if n >= 2 * _FON_WINDOW_MAX
        else min(_FON_WINDOW_MAX, max(10, n // 2))
    )
    occ = _fermi_occ(w, mu, kt)
    c_full = x @ cp
    dm_eigh = (c_full * (occ * (nelec / jnp.sum(occ)))) @ c_full.T
    if m >= n:
        return dm_eigh

    eye = jnp.eye(n, dtype=fp.dtype)
    nf = jnp.sum(w < mu)
    base = jnp.clip(nf - m // 2, 0, n - m)
    cand = jnp.clip(base + (jnp.arange(_FON_CAND) - _FON_CAND // 2), 0, n - m)
    big = jnp.asarray(jnp.inf, dtype=w.dtype)
    glow = jnp.where(cand == 0, big, w[cand] - w[jnp.maximum(cand - 1, 0)])
    ge = cand + m
    ghigh = jnp.where(
        ge == n, big, w[jnp.minimum(ge, n - 1)] - w[ge - 1]
    )
    score = jnp.minimum(glow, ghigh)
    start = cand[jnp.argmax(score)]
    end = start + m

    cut_a = jnp.where(
        start == 0,
        w[0] - 1.0,
        0.5 * (w[jnp.maximum(start - 1, 0)] + w[start]),
    )
    cut_b = jnp.where(
        end == n,
        w[-1] + 1.0,
        0.5 * (w[end - 1] + w[jnp.minimum(end, n - 1)]),
    )
    p_a = _sign_projector_at(fp, w, cut_a, eye)
    p_b = _sign_projector_at(fp, w, cut_b, eye)

    v0 = jax.lax.dynamic_slice(cp, (0, start), (n, m))
    v = (p_b - p_a) @ v0
    gram = v.T @ v
    lmat = jnp.linalg.cholesky(gram)
    # Gram conditioning signal for the `ok` guard below: healthy
    # projectors give v ~ orthonormal (diag(L) ~ 1); a cut gap too small
    # for the 30 Newton-Schulz iterations to resolve (sign eigenvalue
    # stuck near McWeeny's unstable 0.5 fixed point) collapses a window
    # column and diag(L) -> 0/NaN, and the triangular solve then
    # amplifies noise into an O(10 Eh) density error (observed: ABAQ at
    # kT=1.0 jumping -857.4 -> -831.5 with ||dD||~80 mid-ladder)
    lmin = jnp.min(jnp.diagonal(lmat))
    v = jax.scipy.linalg.solve_triangular(lmat, v.T, lower=True).T
    hm = v.T @ fp @ v

    span_lo = w[start]
    span_hi = w[end - 1]
    pad = (
        1e-6 * (jnp.abs(span_lo) + jnp.abs(span_hi))
        + 1e-3 * (span_hi - span_lo)
        + 1e-9
    )
    fm = _cheb_fermi(hm, mu, kt, span_lo - pad, span_hi + pad)

    idx = jnp.arange(n)
    docc = jnp.where(
        idx < start, occ - 2.0, jnp.where(idx >= end, occ, 0.0)
    )
    d_orth = 2.0 * p_a + v @ fm @ v.T + (cp * docc) @ cp.T
    total = 2.0 * start.astype(w.dtype) + jnp.trace(fm) + jnp.sum(docc)
    d_orth = d_orth * (nelec / total)
    dm = x @ d_orth @ x.T
    dm = 0.5 * (dm + dm.T)

    # guards: Chebyshev budget (half-span/kT), a cut gap the sign
    # iteration can actually resolve (RELATIVE to the spectral scale:
    # 30 Newton-Schulz doublings sharpen eigenvalues down to ~1e-5 of
    # the scale, no further -- an absolute 1e-7 floor let through cuts
    # the projector could not represent), a well-conditioned window
    # Gram factor, and an electron count from the window pieces that
    # actually adds up (broken projectors miss by O(1) electrons; the
    # nelec/total rescale would silently paper over that)
    span_r = 0.5 * (span_hi - span_lo + 2.0 * pad) / kt
    scale_est = jnp.maximum(jnp.abs(w[0]), jnp.abs(w[-1])) + 1e-8
    ok = (span_r < 110.0) & (jnp.max(score) > 3e-5 * scale_est)
    ok = ok & jnp.isfinite(lmin) & (lmin > 0.1)
    ok = ok & (jnp.abs(total - nelec) < 0.5)
    ok = ok & jnp.all(jnp.isfinite(dm))
    return jnp.where(ok, dm, dm_eigh)


def _fermi_density(x, f, nelec: float, kt: float):
    """Fermi-smeared density (FON-RKS): occupations 2/(1+exp((e-mu)/kT))
    with mu bisected so they sum to nelec.  The production treatment for
    near-degenerate frontier manifolds (e.g. CuO's open d/pi shell, which
    flip-flops its integer-occupation HOMO forever -- no level shift
    converges it; smearing does).  The reference has no counterpart (it
    crashes on every odd-electron system, ref grid.py:45).

    On TPU the density is rebuilt from sign projectors + a Chebyshev
    window matrix function (_fermi_density_window); the raw eigh route
    (CPU) and the window route agree to ~1e-11 where both are exact.
    DFT_FON_WINDOW=force / =0 overrides the backend dispatch (tests)."""
    fp = x.T @ f @ x
    w, cp = jnp.linalg.eigh(fp)
    mu = _fermi_mu(w, nelec, kt)
    mode = os.environ.get("DFT_FON_WINDOW", "auto")
    use_window = mode == "force" or (mode != "0" and _tpu_backend())
    if use_window:
        return _fermi_density_window(x, fp, w, cp, mu, nelec, kt)
    occ = _fermi_occ(w, mu, kt)
    occ = occ * (nelec / jnp.sum(occ))  # exact electron count
    c = x @ cp
    return (c * occ) @ c.T


def _density_sanity(sys, dm_prev, dm_new):
    """Last-resort N-representability guard on a freshly built density:
    any aufbau/FON density satisfies trace(D S) = nelec and, in the
    S-metric, ||D||_F <= sqrt(2 nelec) (occupations in [0, 2]).  TPU
    eigh can emit garbage EIGENVECTORS on near-degenerate spectra (the
    eigenvalues stay accurate), and every eigh-vector-dependent piece
    of the density build shares that failure mode -- observed once as a
    ||dD|| ~ 6e2 excursion mid-SCF on ABAQ.  When violated, keep the
    previous density and return a huge residual contribution so the
    cycle can never count as converged (the offending Fock is fine and
    stays in the DIIS history; the next extrapolation moves the
    spectrum off the razor edge).  Returns (dm, 0.0) when sane."""
    nelec = 2 * sys.nocc + sys.nopen
    tr_s = jnp.sum(dm_new * sys.s.T)
    sd = sys.s @ dm_new
    nrm = jnp.sqrt(jnp.abs(jnp.sum(sd * sd.T)))
    sane = (
        (jnp.abs(tr_s - nelec) < 0.5)
        & (nrm < jnp.sqrt(2.0 * nelec) + 1.0)
        & jnp.all(jnp.isfinite(dm_new))
    )
    dm_out = jnp.where(sane, dm_new, dm_prev)
    return dm_out, jnp.where(sane, 0.0, 1e3)


def _density_dynocc(x, f, nocc, nopen: int = 0):
    """_density with a TRACED occupied-orbital count (shared-program
    mode): occupations come from an iota mask instead of a static slice,
    and the sign-projector chemical potential uses dynamic takes of the
    eigenvalue vector.  Same math, same TPU purification recovery."""
    fp = x.T @ f @ x
    w, cp = jnp.linalg.eigh(fp)
    c = x @ cp
    n = w.shape[0]
    idx = jnp.arange(n)
    occ = jnp.where(idx < nocc, 2.0, 0.0)
    if nopen:
        occ = occ + jnp.where((idx >= nocc) & (idx < nocc + nopen),
                              1.0, 0.0)
    dm_eigh = (c * occ) @ c.T
    if not _tpu_backend():
        return dm_eigh

    eye = jnp.eye(n, dtype=fp.dtype)

    def proj_at(k):
        wl = jnp.take(w, jnp.maximum(k - 1, 0))
        wu = jnp.take(w, jnp.minimum(k, n - 1))
        return (_sign_projector_at(fp, w, 0.5 * (wl + wu), eye), wu - wl)

    if nopen:
        p0, gap0 = proj_at(nocc)
        p1, gap1 = proj_at(nocc + nopen)
        p = p0 + p1
        gap = jnp.minimum(gap0, gap1)
    else:
        p, gap = proj_at(nocc)
        p = 2.0 * p
    dm_sign = x @ p @ x.T
    dm_sign = 0.5 * (dm_sign + dm_sign.T)
    ok = (gap > 1e-5) & (nocc > 0) & (nocc < n)
    return jnp.where(ok, dm_sign, dm_eigh)


def _density(x, f, nocc, nopen: int = 0):
    """Solve F C = S C e via the orthogonal basis; D = 2 C_occ C_occ^T
    (+ the singly-occupied HOMO for odd-electron systems, nopen=1 --
    fractional-occupation RKS; the reference crashes on these,
    ref grid.py:45).  A traced (non-int) nocc dispatches to
    _density_dynocc (shared-program mode).

    On TPU the eigh eigenvectors are only f32-quality, so the density is
    rebuilt eigendecomposition-free: the occupied-subspace projector is
    P = (I + sign(mu I - F'))/2 with the matrix sign from Newton-Schulz
    iterations (pure f64 matmuls, exact on TPU), using the approximate
    eigenvalues only for the chemical potential mu and the spectral
    scale -- the standard density-purification trick of linear-scaling
    DFT, repurposed as an f64-accuracy recovery on MXU hardware.  For
    nopen=1 the orthogonal-basis density is P_nocc + P_(nocc+1) (doubly
    occupied subspace counted twice, the open HOMO once).  Falls back to
    the eigh density when the HOMO-LUMO gap is too small for the sign
    iteration to resolve."""
    if not isinstance(nocc, int):
        return _density_dynocc(x, f, nocc, nopen)
    fp = x.T @ f @ x
    w, cp = jnp.linalg.eigh(fp)
    c = x @ cp
    cocc = c[:, :nocc]
    dm_eigh = 2.0 * cocc @ cocc.T
    if nopen:
        homo = c[:, nocc:nocc + nopen]
        dm_eigh = dm_eigh + homo @ homo.T
    if not _tpu_backend() or nocc == 0:
        return dm_eigh

    eye = jnp.eye(fp.shape[0], dtype=fp.dtype)
    if nopen:
        p0, gap0 = _sign_projector(fp, w, nocc, eye)
        p1, gap1 = _sign_projector(fp, w, nocc + nopen, eye)
        p = p0 + p1
        gap = jnp.minimum(gap0, gap1)
    else:
        p, gap = _sign_projector(fp, w, nocc, eye)
        p = 2.0 * p
    dm_sign = x @ p @ x.T
    dm_sign = 0.5 * (dm_sign + dm_sign.T)
    return jnp.where(gap > 1e-5, dm_sign, dm_eigh)


import weakref

_PALLAS_PACK_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _packed_for(sys: SCFSystem, needs_grad: bool):
    """Per-system cached Pallas input planes: the one-time f32 transpose
    of the (multi-GB at DHA scale) AO tensors happens once per
    SCFSystem, not once per call site."""
    from quantum_compute_dft_tpu.engine.pallas_xc import pack_pallas_inputs

    per_sys = _PALLAS_PACK_CACHE.setdefault(sys, {})
    ent = per_sys.get(needs_grad)
    if ent is None:
        if sys.ao is None:
            raise RuntimeError(
                "lean-AO SCFSystem has no f64 planes to pack; prepare() "
                "must seed the packed planes via seed_packed()"
            )
        ent = pack_pallas_inputs(sys.ao, sys.weights, sys.ao_grad,
                                 n_grad=needs_grad)
        per_sys[needs_grad] = ent
    return ent


def seed_packed(sys: SCFSystem, needs_grad: bool, ent) -> None:
    """Pre-populate the per-system Pallas plane cache: the lean-AO
    prepare() packs the f32 planes from transient f64 planes (then frees
    them), so _packed_for can never rebuild them from sys.ao."""
    _PALLAS_PACK_CACHE.setdefault(sys, {})[needs_grad] = ent


def transfer_packed(src_sys: SCFSystem, dst_sys: SCFSystem) -> None:
    """Move the packed-plane cache entry to a dataclasses.replace'd copy
    of a system (the cache is keyed by object identity)."""
    ent = _PALLAS_PACK_CACHE.pop(src_sys, None)
    if ent is not None:
        _PALLAS_PACK_CACHE[dst_sys] = ent


def drop_packed(sys: SCFSystem) -> None:
    """Free the packed f32 planes (delta64 endgame of the lean-AO SCF:
    the per-cycle XC switches to the f64 engine, and at north-star scale
    the ~3 GB of packed planes are exactly the headroom the materialized
    f64 planes need)."""
    _PALLAS_PACK_CACHE.pop(sys, None)


def _xc64_step(sys: SCFSystem, functional: Functional, dm, planes=None,
               fast: bool = False):
    """f64 XC (E_xc, V_xc): from explicit (ao, grad, weights) planes
    (the delta64 endgame's late-materialized, zero-weight-padded set),
    sys planes, or the streamed on-device AO path (lean-AO mode).

    fast=True selects the anchor-grade engine (xc_step_f64_fast: exact
    f64 density pipeline + compensated split-f32 grad-rho + f32-HIGHEST
    V GEMM; ~4x cheaper at DHA, measured dE_xc 1.3e-8 / dV 1.5e-6 vs
    exact).  Used for delta-tail anchors and delta64 endgame cycles,
    where the smooth deterministic bias cancels in |dE| and shifts the
    final (exact-engine) energy only at O(eps^2); the strict 'f64'
    xc_impl and the final parity evaluation keep the exact engine.
    DFT_F64_ANCHOR=exact reverts."""
    if fast and os.environ.get("DFT_F64_ANCHOR") == "exact":
        fast = False
    if fast:
        from quantum_compute_dft_tpu.engine.xc_engine import (
            xc_step_f64_fast,
            xc_step_onfly_fast,
        )

        if planes is not None:
            ao, ao_grad, w = planes
            return xc_step_f64_fast(functional, dm, ao, w, ao_grad)
        if sys.ao is not None:
            return xc_step_f64_fast(functional, dm, sys.ao, sys.weights,
                                    sys.ao_grad)
        coords, tables = sys.ao_tables  # lean-AO: streamed fast anchor
        return xc_step_onfly_fast(functional, dm, coords, sys.weights,
                                  tables)
    if planes is not None:
        ao, ao_grad, w = planes
        return xc_step(functional, dm, ao, w, ao_grad)
    if sys.ao is not None:
        return xc_step(functional, dm, sys.ao, sys.weights, sys.ao_grad)
    from quantum_compute_dft_tpu.engine.xc_engine import xc_step_onfly

    coords, tables = sys.ao_tables
    return xc_step_onfly(functional, dm, coords, sys.weights, tables)


def _xc64_energy(sys: SCFSystem, functional: Functional, dm, planes=None):
    """E_xc-only counterpart of _xc64_step (final parity evaluation)."""
    from quantum_compute_dft_tpu.engine.xc_engine import (
        xc_energy,
        xc_energy_onfly,
    )

    if planes is not None:
        ao, ao_grad, w = planes
        return xc_energy(functional, dm, ao, w, ao_grad)
    if sys.ao is not None:
        return xc_energy(functional, dm, sys.ao, sys.weights, sys.ao_grad)
    coords, tables = sys.ao_tables
    return xc_energy_onfly(functional, dm, coords, sys.weights, tables)


def _xc64_plane_bytes(sys: SCFSystem, functional: Functional,
                      chunk: int = 8192) -> int:
    """f64 HBM bytes _materialize_xc_planes would allocate."""
    coords, tables = sys.ao_tables
    g = coords.shape[0]
    g_pad = g + ((-g) % chunk)
    nao = sys.hcore.shape[0]
    n_planes = 4 if functional.needs_grad else 1
    return n_planes * g_pad * nao * 8


def _materialize_xc_planes(sys: SCFSystem, functional: Functional,
                           chunk: int = 8192):
    """Lean-AO delta64 endgame: swap HBM residency from the per-cycle
    Pallas f32 planes (no longer called -- every remaining cycle runs
    the f64 XC engine) to late-materialized f64 planes, so the endgame
    pays the plane-path speed instead of a per-cycle streamed AO
    re-evaluation.  Returns (ao, grad, weights) zero-padded to a chunk
    multiple (padded rows carry zero quadrature weight)."""
    from quantum_compute_dft_tpu.engine.ao_eval import eval_planes_scan

    drop_packed(sys)
    # drain pending cycle work BEFORE enqueueing the 6.5 GB plane build:
    # in-flight dispatches still reference the just-dropped packed
    # planes, and the async queue would hold both sets at peak
    float(sys.hcore[0, 0])
    coords, tables = sys.ao_tables
    g = coords.shape[0]
    pad = (-g) % chunk
    crd = jnp.pad(coords, ((0, pad), (0, 0)))
    w_pad = jnp.pad(sys.weights, (0, pad))
    ao, grad = eval_planes_scan(crd, tables, functional.needs_grad, chunk)
    # fence: force the (multi-GB) plane build before the endgame cycles
    # enqueue on top of it (the axon queue is fully async; unforced
    # pipelines peak at the sum of all their buffers)
    float(ao[0, 0])
    return ao, grad, w_pad


def _pallas_xc(sys: SCFSystem, functional: Functional, dm):
    from quantum_compute_dft_tpu.engine.pallas_xc import xc_step_pallas_packed

    aot, wt, grads = _packed_for(sys, functional.needs_grad)
    return xc_step_pallas_packed(functional, dm, aot, wt, grads,
                                 sys.hcore.shape[0])


def _build_j(sys: SCFSystem, dm, fast: bool = False):
    if sys.eri is not None:
        return coulomb_full(sys.eri, dm)
    if fast and sys.df_coulomb_fast is not None:
        return sys.df_coulomb_fast(dm)
    return sys.df_coulomb(dm)


def _build_k(sys: SCFSystem, dm, hi: bool = False, fast: bool = False):
    if sys.eri is not None:
        return exchange_full(sys.eri, dm)
    if fast and not hi and sys.df_exchange_fast is not None:
        return sys.df_exchange_fast(dm)
    fn = sys.df_exchange_hi if (hi and sys.df_exchange_hi) else sys.df_exchange
    return fn(dm)


def _fast_j(sys: SCFSystem, dm, k_arg):
    """Fast f32 J; prefers the aux-major factor passed as a jit ARGUMENT
    (k_arg) over the builder closure -- inside a jitted cycle program the
    closure's tensor becomes an embedded constant and the remote-compile
    body limit rejects multi-100-MB programs (HTTP 413)."""
    if k_arg is not None:
        from quantum_compute_dft_tpu.integrals.density_fitting import (
            _cd_coulomb_f32,
        )

        return _cd_coulomb_f32(k_arg, dm)
    return _build_j(sys, dm, fast=True)


def _fast_k(sys: SCFSystem, dm, k_arg):
    """Fast f32 K; same argument-vs-closure contract as _fast_j."""
    if k_arg is not None:
        from quantum_compute_dft_tpu.integrals.density_fitting import (
            _df_exchange_fast,
        )

        return _df_exchange_fast(k_arg, dm)
    return _build_k(sys, dm, hi=False, fast=True)


@functools.partial(jax.jit,
                   static_argnames=("sys", "functional", "smear_kt",
                                    "mixer"))
def _scf_iteration_impl(sys: SCFSystem, functional: Functional, dm, diis,
                        shift=0.0, smear_kt: float = 0.0,
                        mixer: str = "cdiis", mix_alpha=0.2, t_arg=None):
    """One SCF cycle: returns (dm_new, diis, EnergyBreakdown, E_xc parts).
    `shift` is the level-shift sigma (traced scalar; 0 = off);
    `smear_kt` > 0 switches to Fermi-smeared occupations (FON-RKS);
    `mixer` selects CDIIS (default), energy-based ADIIS (`diis` must
    then be an ADIISState), or 'mix' (damped linear mixing, no
    extrapolation -- see _cycle_tail's note; `diis` is left untouched)."""
    if t_arg is not None:
        sys = t_arg  # shared-program mode: tensors arrive as arguments
    j = _build_j(sys, dm)
    e_xc, vxc = _xc64_step(sys, functional, dm)
    c_hf = functional.hyb_coeff
    if c_hf != 0.0:
        k = _build_k(sys, dm, hi=True)
        f = sys.hcore + j + vxc - 0.5 * c_hf * k
    else:
        k = None
        f = sys.hcore + j + vxc

    if mixer == "adiis":
        diis, f = adiis_update(diis, f, dm)
    elif mixer != "mix":
        diis, f = diis_update(diis, f, dm, sys.s, sys.x)
    f = _level_shift(f, dm, sys.s, shift)
    if smear_kt > 0.0:
        dm_new = _fermi_density(sys.x, f, 2 * sys.nocc + sys.nopen, smear_kt)
    else:
        dm_new = _density(sys.x, f, sys.nocc, sys.nopen)
    if mixer == "mix":
        dm_new = dm + mix_alpha * (dm_new - dm)

    e_one = jnp.sum(dm_new * sys.hcore)
    e_coul = 0.5 * jnp.sum(dm_new * j)
    e_ex = (
        -0.25 * c_hf * jnp.sum(dm_new * k) if k is not None else jnp.asarray(0.0)
    )
    e_tot = e_one + e_coul + e_xc + e_ex + sys.e_nuc
    return dm_new, diis, EnergyBreakdown(e_tot, e_one, e_coul, e_xc, e_ex)


def scf_iteration(sys: SCFSystem, functional: Functional, dm, diis,
                  shift=0.0, smear_kt: float = 0.0, mixer: str = "cdiis",
                  mix_alpha=0.2):
    """See _scf_iteration_impl; this wrapper routes shared-mode systems'
    tensors through as jit arguments (_sys_split)."""
    key, targ = _sys_split(sys)
    return _scf_iteration_impl(key, functional, dm, diis, shift=shift,
                               smear_kt=smear_kt, mixer=mixer,
                               mix_alpha=mix_alpha, t_arg=targ)


def energy_of_dm(sys: SCFSystem, functional: Functional, dm,
                 xc_planes=None) -> EnergyBreakdown:
    """Self-consistent total energy at a given density: every term (J, XC,
    K) is evaluated from THIS dm, so near the SCF fixed point the result
    is variationally stationary (second-order in density error) -- unlike
    the per-iteration energy, which mixes dm_new with J(dm_old) exactly as
    the reference does (ref dft.py:230-236) and therefore carries ~1e-9
    first-order noise at convergence."""
    j = _build_j(sys, dm)
    e_xc = _xc64_energy(sys, functional, dm, planes=xc_planes)
    c_hf = functional.hyb_coeff
    e_one = jnp.sum(dm * sys.hcore)
    e_coul = 0.5 * jnp.sum(dm * j)
    if c_hf != 0.0:
        k = _build_k(sys, dm, hi=True)
        e_ex = -0.25 * c_hf * jnp.sum(dm * k)
    else:
        e_ex = jnp.asarray(0.0)
    e_tot = e_one + e_coul + e_xc + e_ex + sys.e_nuc
    return EnergyBreakdown(e_tot, e_one, e_coul, e_xc, e_ex)


def initial_guess(sys: SCFSystem) -> jnp.ndarray:
    """SAD (superposition of atomic densities) when available -- typically
    halves the iteration count -- else the reference's Hcore guess
    (ref dft.py:181-182)."""
    if sys.dm_sad is not None:
        return sys.dm_sad
    return _density(sys.x, sys.hcore, sys.nocc, sys.nopen)


# ---------------------------------------------------------------------------
# Staged iteration: the same cycle as scf_iteration but dispatched as a few
# separately-jitted programs.  The axon remote TPU compiler is superlinear
# in graph size (measured: pieces ~25 s total vs 328 s fused for LDA/H2O),
# so on TPU the staged path compiles ~13x faster at negligible dispatch
# cost; results are bitwise-identical math.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("c_hf",))
def _fock(hcore, j, vxc, k, c_hf: float):
    return hcore + j + vxc - 0.5 * c_hf * k if c_hf != 0.0 else hcore + j + vxc


@functools.partial(jax.jit, static_argnames=("sys", "functional", "delta",
                                              "smear_kt", "phi_split",
                                              "fast_jk", "mixer"))
def _cycle_full_impl(sys: SCFSystem, functional: Functional, dm,
                     diis: DIISState, packed, base, delta: bool, shift=0.0,
                     smear_kt: float = 0.0, phi_split: bool = False,
                     fast_jk: bool = False, j_arg=None, k_arg=None,
                     mixer: str = "cdiis", mix_alpha=0.2, t_arg=None):
    """Whole Pallas-driven SCF cycle as ONE dispatch (XC custom call +
    J/K/Fock/DIIS/solve/energies): the Pallas graph is compact enough to
    fuse, unlike the f64 XC scan (which stays a separate dispatch -- the
    remote compiler is superlinear in graph size).  `packed` are the
    cached transposed f32 planes from pack_pallas_inputs."""
    from quantum_compute_dft_tpu.engine.pallas_xc import xc_step_pallas_packed

    sy = t_arg if t_arg is not None else sys
    aot, wt, grads = packed
    exc_in, vxc_in = xc_step_pallas_packed(functional, dm, aot, wt, grads,
                                           sy.hcore.shape[0],
                                           phi_split=phi_split)
    # a 2-tuple base is the J-anchor of the 'fast' phase and passes
    # through even with delta=False (see _cycle_tail_impl)
    keep_base = delta or (base is not None and len(base) == 2)
    return _cycle_tail_impl(sys, functional, dm, diis, exc_in, vxc_in,
                            base if keep_base else None, k_hi=delta,
                            shift=shift, smear_kt=smear_kt,
                            fast_jk=fast_jk, j_arg=j_arg, k_arg=k_arg,
                            mixer=mixer, mix_alpha=mix_alpha, t_arg=t_arg)


def _cycle_full(sys: SCFSystem, functional: Functional, dm,
                diis: DIISState, packed, base, delta: bool, shift=0.0,
                smear_kt: float = 0.0, phi_split: bool = False,
                fast_jk: bool = False, j_arg=None, k_arg=None,
                mixer: str = "cdiis", mix_alpha=0.2):
    key, targ = _sys_split(sys)
    return _cycle_full_impl(key, functional, dm, diis, packed, base,
                            delta, shift=shift, smear_kt=smear_kt,
                            phi_split=phi_split, fast_jk=fast_jk,
                            j_arg=j_arg, k_arg=k_arg, mixer=mixer,
                            mix_alpha=mix_alpha, t_arg=targ)


@functools.partial(jax.jit, static_argnames=("sys", "functional", "k_hi",
                                              "smear_kt", "fast_jk",
                                              "mixer"))
def _cycle_tail_impl(sys: SCFSystem, functional: Functional, dm,
                     diis: DIISState, exc_in, vxc_in, base, k_hi: bool,
                     shift=0.0, smear_kt: float = 0.0,
                     fast_jk: bool = False, j_arg=None, k_arg=None,
                     mixer: str = "cdiis", mix_alpha=0.2, t_arg=None):
    """Everything after the XC build, fused into ONE dispatch: J, K,
    Fock assembly, DIIS, eigensolve/purification, energies, and the
    6-scalar stat vector.  Each separate dispatch enqueue costs ~25 ms
    over the TPU tunnel, and the unfused cycle made ~8 of them -- at DHA
    scale that was ~2/3 of the wall-clock per cycle.

    base=None: exc_in/vxc_in are the XC results, K built at `k_hi`
    precision; `fast_jk` selects the f32/bf16-split J/K builders (the
    mixed schedule's far-from-convergence phase, ~1e-5 error absorbed
    like the split-phi_D kernel's).
    base=(dm0, exc0_64, vxc0_64, exc0_32, vxc0_32, k0_hi, j0_64):
    delta mode -- exc_in/vxc_in are the raw Pallas f32 results and every
    term anchors to the f64 evaluation at dm0 (see scf_iteration_staged);
    J and K apply fast increments by linearity (error ~1e-5 x increment,
    parity-negligible).
    base=(dm0, k0_hi, j0_64): the 'delta64' endgame -- exc_in/vxc_in
    already come from the f64 XC engine (no anchor cancellation needed;
    XC is the only NONLINEAR Fock term, so its f32 delta noise is the
    noise of a full evaluation and scales with nao -- at nao=377 that
    floor sits at ||dD||~1e-5, above the 1e-6 criterion), while J/K keep
    the exact-by-linearity fast increments whose noise shrinks with the
    remaining error.
    """
    if t_arg is not None:
        sys = t_arg  # shared-program mode: tensors arrive as arguments
    c_hf = functional.hyb_coeff
    if base is None:
        # fast_jk: False = f64 J + standard K; True = fast f32 J and K
        # (mixed early phase, where the delta tail absorbs the noise);
        # "k" = fast K but f64 J -- the 'fast' whole-SCF schedule, where
        # J's f32 rounding steps (~1e-6 elementwise) would stall the
        # ||dD|| < 1e-6 settling but K's (0.2x smaller in the Fock) do
        # not (measured: DHA converges in ~21 cycles with f64 J, hits
        # max_cycle with f32 J)
        if fast_jk is True:
            j = _fast_j(sys, dm, k_arg)
        elif j_arg is not None:
            # f64 J with the AUX-MAJOR Cholesky factor as a jit ARGUMENT
            # (not a builder-closure constant): see SCFSystem.df_b64
            from quantum_compute_dft_tpu.integrals.density_fitting import (
                _cd_coulomb_q,
            )

            j = _cd_coulomb_q(j_arg, dm)
        else:
            j = _build_j(sys, dm)
        e_xc, vxc = exc_in, vxc_in
        if c_hf == 0.0:
            k = jnp.zeros_like(j)
        elif fast_jk in (True, "k") and not k_hi:
            k = _fast_k(sys, dm, k_arg)
        else:
            k = _build_k(sys, dm, hi=k_hi)
    elif len(base) == 2:
        # J-anchored 'fast' phase (round 4): exc_in/vxc_in are the
        # per-cycle Pallas XC results exactly as in the base=None fast
        # path, but J comes from ONE exact f64 evaluation at the anchor
        # density plus an f32 increment by linearity -- the profiled
        # DHA fast cycle was 61 ms of which the per-cycle f64 J matvec
        # was 43 (the f64 matmul emulation never engages for matvecs:
        # ~3 GFLOP/s); the increment's f32 rounding scales with
        # ||dm - dm0||, and the host re-anchors on every dnorm decade,
        # so the J error VANISHES toward convergence instead of
        # stalling the ||dD|| < 1e-6 settling the way full-f32 J did.
        dm0_b, j0_64 = base
        e_xc, vxc = exc_in, vxc_in
        j = j0_64 + _fast_j(sys, dm - dm0_b, k_arg)
        if c_hf == 0.0:
            k = jnp.zeros_like(j)
        elif fast_jk in (True, "k") and not k_hi:
            k = _fast_k(sys, dm, k_arg)
        else:
            k = _build_k(sys, dm, hi=k_hi)
    elif len(base) == 3:
        # delta64 endgame: f64 XC passthrough, J/K anchored by linearity
        dm0_b, k0_hi, j0_64 = base
        e_xc, vxc = exc_in, vxc_in
        j = j0_64 + _fast_j(sys, dm - dm0_b, k_arg)
        if c_hf != 0.0:
            k = k0_hi + _fast_k(sys, dm - dm0_b, k_arg)
        else:
            k = jnp.zeros_like(j)
    else:
        dm0_b, exc0_64, vxc0_64, exc0_32, vxc0_32, k0_hi, j0_64 = base
        # J is linear in D: J64(dm0) + Jfast(dm - dm0) is exact up to
        # f32 rounding of the (tiny) increment -- removes the
        # emulated-f64 J contraction (~55 ms/cycle at DHA) from the tail
        j = j0_64 + _fast_j(sys, dm - dm0_b, k_arg)
        e_xc = exc0_64 + (exc_in - exc0_32)
        vxc = vxc0_64 + (vxc_in - vxc0_32)
        if c_hf != 0.0:
            # exact by linearity of K in D (in-core and DF alike); the
            # fast (f32 at scale) path only ever sees the small increment
            k = k0_hi + _fast_k(sys, dm - dm0_b, k_arg)
        else:
            k = jnp.zeros_like(j)
    f = _fock(sys.hcore, j, vxc, k, c_hf)
    if mixer == "adiis":
        # energy-based mixing for the far-from-convergence phase (see
        # scf.diis): `diis` must then be an ADIISState
        diis, f = adiis_update(diis, f, dm)
    elif mixer != "mix":
        diis, f = diis_update(diis, f, dm, sys.s, sys.x)
    f = _level_shift(f, dm, sys.s, shift)
    if smear_kt > 0.0:
        dm_new = _fermi_density(sys.x, f, 2 * sys.nocc + sys.nopen, smear_kt)
    else:
        dm_new = _density(sys.x, f, sys.nocc, sys.nopen)
    dm_new, insane = _density_sanity(sys, dm, dm_new)
    dnorm = jnp.linalg.norm(dm_new - dm) + insane
    if mixer == "mix":
        # damped linear mixing: no extrapolation at all.  The fallback
        # for states whose SCF map any DIIS-family mixer destabilizes
        # (observed: ABAQ -- compressed 2D-sketch geometry, metallic
        # spectrum -- charge-sloshes +-1 Eh under BOTH CDIIS and ADIIS
        # at kT=0.5, while plain alpha=0.2 under-relaxation contracts
        # monotonically).  dnorm above stays the RAW map residual --
        # the fixed points coincide, and the raw residual is the honest
        # convergence signal; the DIIS history is left untouched for
        # the CDIIS phase that follows a 'mix+cdiis' handover.
        dm_new = dm + mix_alpha * (dm_new - dm)
    eb = _energies(dm_new, sys.hcore, j, k, e_xc,
                   jnp.asarray(sys.e_nuc), c_hf)
    stat = jnp.stack([eb.e_tot, dnorm, eb.e_one, eb.e_coul, eb.e_xc,
                      eb.e_ex_hf])
    return dm_new, diis, stat


def _cycle_tail(sys: SCFSystem, functional: Functional, dm,
                diis: DIISState, exc_in, vxc_in, base, k_hi: bool,
                shift=0.0, smear_kt: float = 0.0, fast_jk: bool = False,
                j_arg=None, k_arg=None, mixer: str = "cdiis",
                mix_alpha=0.2):
    key, targ = _sys_split(sys)
    return _cycle_tail_impl(key, functional, dm, diis, exc_in, vxc_in,
                            base, k_hi=k_hi, shift=shift,
                            smear_kt=smear_kt, fast_jk=fast_jk,
                            j_arg=j_arg, k_arg=k_arg, mixer=mixer,
                            mix_alpha=mix_alpha, t_arg=targ)


@functools.partial(jax.jit, static_argnames=("nocc", "nopen"))
def _solve_density(x, f, dm, nocc: int, nopen: int = 0):
    dm_new = _density(x, f, nocc, nopen)
    return dm_new, jnp.linalg.norm(dm_new - dm)


@functools.partial(jax.jit, static_argnames=("c_hf",))
def _energies(dm_new, hcore, j, k, e_xc, e_nuc, c_hf: float):
    e_one = jnp.sum(dm_new * hcore)
    e_coul = 0.5 * jnp.sum(dm_new * j)
    e_ex = -0.25 * c_hf * jnp.sum(dm_new * k)
    e_tot = e_one + e_coul + e_xc + e_ex + e_nuc
    return EnergyBreakdown(e_tot, e_one, e_coul, e_xc, e_ex)


@functools.partial(jax.jit, static_argnames=("sys", "functional", "delta",
                                              "smear_kt", "phi_split",
                                              "fast_jk", "n_steps"))
def _cycle_block_impl(sys: SCFSystem, functional: Functional, dm,
                      diis: DIISState, packed, base, delta: bool,
                      n_steps: int, shift=0.0, smear_kt: float = 0.0,
                      phi_split: bool = False, fast_jk: bool = False,
                      j_arg=None, k_arg=None, t_arg=None):
    """n_steps Pallas-driven SCF cycles as ONE dispatch (lax.scan over
    the _cycle_full body), returning the stacked per-cycle stat vectors.
    Each dispatch enqueue costs ~25 ms and each stat fetch ~33 ms over
    the TPU tunnel -- at ~60 ms of device work per DHA cycle that
    overhead was half the wall-clock.  The host processes the n_steps
    stat rows after the block: convergence/switch decisions trail by at
    most n_steps-1 cheap cycles, and the caller only blocks when the
    damping/level-shift guards cannot fire (smooth trajectories)."""
    from quantum_compute_dft_tpu.engine.pallas_xc import xc_step_pallas_packed

    sy = t_arg if t_arg is not None else sys
    aot, wt, grads = packed

    keep_base = delta or (base is not None and len(base) == 2)

    def body(carry, _):
        dm, diis = carry
        exc_in, vxc_in = xc_step_pallas_packed(functional, dm, aot, wt,
                                               grads, sy.hcore.shape[0],
                                               phi_split=phi_split)
        dm_new, diis, stat = _cycle_tail_impl(
            sys, functional, dm, diis, exc_in, vxc_in,
            base if keep_base else None, k_hi=delta, shift=shift,
            smear_kt=smear_kt, fast_jk=fast_jk, j_arg=j_arg, k_arg=k_arg,
            t_arg=t_arg,
        )
        return (dm_new, diis), stat

    (dm, diis), stats = jax.lax.scan(body, (dm, diis), None, length=n_steps)
    return dm, diis, stats


def _cycle_block(sys: SCFSystem, functional: Functional, dm,
                 diis: DIISState, packed, base, delta: bool, n_steps: int,
                 shift=0.0, smear_kt: float = 0.0, phi_split: bool = False,
                 fast_jk: bool = False, j_arg=None, k_arg=None):
    key, targ = _sys_split(sys)
    return _cycle_block_impl(key, functional, dm, diis, packed, base,
                             delta, n_steps, shift=shift,
                             smear_kt=smear_kt, phi_split=phi_split,
                             fast_jk=fast_jk, j_arg=j_arg, k_arg=k_arg,
                             t_arg=targ)


def scf_iteration_staged(sys: SCFSystem, functional: Functional, dm,
                         diis: DIISState, timer=None, xc_impl: str = "f64",
                         delta_base=None, shift=0.0, smear_kt: float = 0.0,
                         phi_split: bool = False, fast_jk: bool = False,
                         j_arg=None, k_arg=None, xc_planes=None,
                         mixer: str = "cdiis", mix_alpha=0.2):
    """One SCF cycle as TWO jitted dispatches: the XC build (Pallas f32,
    the f64 engine, or a raw Pallas call feeding the delta anchors) and
    the fused _cycle_tail (J/K/Fock/DIIS/solve/energies/stats).

    The axon remote compiler is superlinear in graph size (seconds for
    each piece here, 300+ s when everything fuses into one program), and
    each dispatch ENQUEUE costs ~25 ms over the TPU tunnel -- two
    dispatches per cycle is the sweet spot.

    xc_impl: 'f64' (parity path), 'pallas' (fused f32 TPU kernel, ~20x
    faster per call), 'delta' (f32 increments on an f64 anchor -- pass
    delta_base from make_delta_base), or 'delta64' (f64 XC every cycle +
    J/K anchored by linearity -- the endgame for systems whose nao-scaled
    f32 XC delta noise sits above the ||dD|| criterion; pass the SAME
    delta_base).  Returns (dm_new, diis, stat6) with
    stat6 = [e_tot, dnorm, e_one, e_coul, e_xc, e_ex]."""
    from quantum_compute_dft_tpu.utils.profiling import PhaseTimer

    fence = timer is not None  # only fence phases when someone is timing:
    # a blocked dispatch costs a full host<->TPU round-trip (~27 ms over
    # the tunnel), so the hot loop stays fully async otherwise
    timer = timer or PhaseTimer()
    if xc_impl in ("pallas", "delta"):
        # one fused dispatch per cycle; the packed planes come from the
        # per-system cache
        packed = _packed_for(sys, functional.needs_grad)
        with timer.phase("cycle_" + xc_impl):
            # delta mode must keep the safe kernel: the anchor's f32
            # evaluation (make_delta_base) and the per-cycle increments
            # must come from the SAME kernel variant for the rounding to
            # cancel
            dm_new, diis, stat = _cycle_full(
                sys, functional, dm, diis, packed, delta_base,
                delta=xc_impl == "delta", shift=shift, smear_kt=smear_kt,
                phi_split=phi_split and xc_impl == "pallas",
                fast_jk=fast_jk if xc_impl == "pallas" else False,
                j_arg=j_arg if xc_impl == "pallas" else None,
                k_arg=k_arg, mixer=mixer, mix_alpha=mix_alpha,
            )
            if fence:
                jax.block_until_ready(stat)
        return dm_new, diis, stat
    if xc_impl == "delta64":
        # f64 XC engine (separate dispatch -- the remote compiler is
        # superlinear in graph size) + the J/K-anchored fused tail
        with timer.phase("xc", sync=None):
            # fast (anchor-grade) engine only below nao ~256: its split-
            # f32 V carries ~1e-6 QUANTIZATION noise that is non-smooth
            # in dm, and the delta64 endgame exists precisely because
            # f32-class XC noise scales with nao past the ||dD|| < 1e-6
            # criterion -- measured at the L1 north star (nao=377): the
            # fast per-cycle engine pinned dn at 3-8e-6 for 400 cycles
            # where the exact engine converged in 225.  One-time ANCHORS
            # (make_delta_base) keep the fast engine at every scale: a
            # constant Fock offset shifts the fixed point O(eps) without
            # touching the settle.
            exc_in, vxc_in = _xc64_step(sys, functional, dm,
                                        planes=xc_planes,
                                        fast=dm.shape[0] < 256)
        with timer.phase("cycle_tail"):
            base3 = (delta_base[0], delta_base[5], delta_base[6])
            dm_new, diis, stat = _cycle_tail(
                sys, functional, dm, diis, exc_in, vxc_in, base3,
                k_hi=True, shift=shift, smear_kt=smear_kt, k_arg=k_arg,
                mixer=mixer, mix_alpha=mix_alpha,
            )
        return dm_new, diis, stat
    with timer.phase("xc", sync=None):
        exc_in, vxc_in = _xc64_step(sys, functional, dm, planes=xc_planes)
        if fence:
            jax.block_until_ready(vxc_in)
    with timer.phase("cycle_tail"):
        dm_new, diis, stat = _cycle_tail(
            sys, functional, dm, diis, exc_in, vxc_in, None, k_hi=True,
            shift=shift, smear_kt=smear_kt, mixer=mixer,
            mix_alpha=mix_alpha,
        )
    return dm_new, diis, stat


def make_delta_base(sys: SCFSystem, functional: Functional, dm,
                    xc_planes=None, need_f32: bool = True,
                    need_xc: bool = True):
    """f64 anchors for the 'delta' tail: one f64 XC + one f64 K + one f64
    J at the anchor density, plus the matching Pallas-f32 XC evaluation
    whose rounding cancels against later Pallas calls.

    At north-star scale (nao>=256, ngrid~290k) the f64 XC and f64 K each
    carry multi-GB workspaces; async enqueue lets them coexist in HBM, so
    the anchor sequences its dispatches with scalar fetches there (a few
    ~33 ms round-trips per anchor, which happens O(1) times per SCF)."""
    big = dm.shape[0] >= 256

    def _fence(x):
        if big:
            jax.device_get(x if x.ndim == 0 else x[0, 0])

    # need_xc=False: the delta64 endgame consumes only (dm, k0, j0) --
    # its per-cycle XC is a fresh f64 evaluation, so (re-)anchors can
    # skip the XC anchor entirely (at north-star scale that is seconds
    # of streamed-AO work per re-anchor)
    exc0_64 = vxc0_64 = None
    if need_xc:
        exc0_64, vxc0_64 = _xc64_step(sys, functional, dm,
                                      planes=xc_planes, fast=True)
        _fence(exc0_64)
    # the delta64 endgame only consumes (dm, k0, j0) -- skip the f32
    # anchor (whose packed planes drop_packed may already have freed)
    exc0_32 = vxc0_32 = None
    if need_f32:
        exc0_32, vxc0_32 = _pallas_xc(sys, functional, dm)
        _fence(exc0_32)
    k0_hi = None
    if functional.hyb_coeff != 0.0:
        k0_hi = _build_k(sys, dm, hi=True)
        _fence(k0_hi)
    j0_64 = _build_j(sys, dm)
    return (dm, exc0_64, vxc0_64, exc0_32, vxc0_32, k0_hi, j0_64)


def scf_host_staged(
    sys: SCFSystem,
    functional: Functional,
    callback: Callable | None = None,
    max_cycle: int = MAX_CYCLE,
    conv_tol_e: float = CONV_TOL_E,
    conv_tol_d: float = CONV_TOL_D,
    dm0: jnp.ndarray | None = None,
    timer=None,
    xc_impl: str = "f64",
    mixed_switch_tol: float = 1e-5,
    delta_refresh: int = 50,
    smear_kt: float = 0.0,
    mixer: str = "cdiis",
    mix_alpha: float = 0.2,
    phi_split_early: bool | None = None,
    block_cycles: int = 4,
    # near-convergence anchor re-anchoring: was needed while the delta
    # increments carried the bf16-split K's ~1e-5 noise; with the
    # aux-major f32-HIGHEST J/K (~1e-6 of a shrinking increment) it
    # costs more than it saves (measured DHA: off 3.4 s/35 cyc vs
    # on 4.6 s/37 cyc -- each refresh pays a ~1 s f64 anchor)
    near_refresh: bool = False,
    # f64-XC endgame for the mixed schedule: 'auto' enters it when the
    # delta tail stalls at its f32-XC noise floor (XC is the only
    # nonlinear Fock term -- its delta noise is a FULL f32 evaluation's
    # and scales with nao; observed ||dD|| floor ~1e-5 at nao=377, above
    # the 1e-6 criterion), 'on' enters it straight at the precision
    # switch (tests), 'off' never
    xc64_tail: str = "auto",
    # mid-run checkpointing: called as checkpoint_cb(cycle, dm, e_tot)
    # every checkpoint_every cycles (see scf.checkpoint.periodic_saver)
    # -- the staged loop holds dm host-side every block anyway, so the
    # only added cost is one ~nao^2 device fetch per save
    checkpoint_cb: Callable | None = None,
    checkpoint_every: int = 25,
) -> SCFResult:
    """xc_impl: 'f64', 'pallas', 'mixed', or 'fast'.

    'mixed' drives early cycles with the ~20x-faster f32 Pallas XC and,
    once |dE| < mixed_switch_tol, switches to DELTA refinement: every
    quantity anchors to one f64 evaluation at the switch density and
    subsequent cycles apply f32 increments (see scf_iteration_staged's
    'delta' branch) -- parity-grade Fock matrices at Pallas-iteration
    cost.  The anchor refreshes every `delta_refresh` cycles, and the
    final reported energies are re-evaluated fully in f64.

    'fast' runs the WHOLE SCF on the f32 engines (safe Pallas XC + the
    aux-major fast J/K) to the full convergence rule and re-evaluates
    the final energy in f64.  The f32 Fock error (~1e-5) shifts the
    fixed-point density by O(eps); at that density the exact-f64 energy
    is variationally stationary, so the REPORTED energy error is
    O(eps^2) -- measured vs the f64 path: benzene +3.4e-8, Decane
    +2.3e-9, DHA -3.6e-8 Eh, 25x inside the 1e-6 parity bar, with no
    f64 anchor evaluations at all (DHA: 1.5 s vs 3.0 s mixed)."""
    import numpy as np

    if (xc_impl != "f64" and jax.default_backend() == "cpu"
            and os.environ.get("DFT_PALLAS_INTERPRET") != "1"):
        xc_impl = "f64"  # the Pallas kernel is TPU-only

    dm = initial_guess(sys) if dm0 is None else jnp.asarray(dm0)
    if phi_split_early is None:
        # with the aux-major fast J/K (~1e-6 rel) making cycles cheap,
        # the split-phi_D kernel's ~1e-4 XC noise costs more in extra
        # cycles than its 1.4 ms/call saves (measured DHA: 42 cyc/5.4 s
        # split vs 32 cyc/4.9 s safe) -- keep the exact-f32 kernel
        phi_split_early = False
    # mixer='adiis+cdiis': energy-based ADIIS while far from convergence
    # (configuration-slosh-proof -- see scf.diis), CDIIS endgame after
    # ||dD|| < ADIIS_TO_CDIIS.  Same strategy as scf_host's, made
    # available at staged-runner shapes (the host loop cannot compile
    # past ~100 MB of AO planes over the TPU tunnel; see scf_host note)
    use_adiis = mixer.startswith("adiis")
    # mixer='mix+cdiis' / 'mix': damped linear mixing first (the
    # DIIS-destabilized-map fallback; see _cycle_tail), CDIIS endgame
    # after the raw map residual drops below MIX_TO_CDIIS ('mix' alone
    # never hands over).  The DIIS history stays empty during mixing.
    use_mix = mixer.startswith("mix")
    diis = (adiis_init if use_adiis else diis_init)(dm.shape[0])
    shiftc = _ShiftController(dm.shape[0])
    e_old = 0.0
    dnorm_prev = float("inf")
    eb = EnergyBreakdown(*(float("nan"),) * 5)  # bound even at max_cycle=0
    e_tot = float("nan")
    impl = "pallas" if xc_impl in ("pallas", "mixed", "fast") else "f64"
    delta_base = None
    cycles_since_anchor = 0
    anchor_dnorm = float("inf")
    dn_hist: list[float] = []  # mixed f32-phase dnorms (stall detector)
    dn_hist64: list[float] = []  # delta-phase dnorms (f64-XC endgame)
    dn_hist_d64: list[float] = []  # delta64-phase dnorms (re-anchoring)
    d64_reanchors = 0
    fast_dn_streak = 0  # 'fast' phase: cycles with ||dD|| already converged
    # J-anchor of the DF 'fast' phase: (dm0, J64(dm0)), re-anchored on
    # every dnorm decade; per-cycle J is j0 + f32(increment) by
    # linearity (see _cycle_tail_impl's 2-tuple base branch)
    j_anchor = None
    j_anchor_dn = float("inf")
    cycle = 0
    xc_planes = None  # lean-AO delta64 endgame: late-materialized planes
    xc_planes_decided = False
    # 'fast' convergence must be verified on the f64-anchored delta tail
    # before it counts (see the spurious-fixed-point note at the check)
    fast_verify_pending = xc_impl == "fast"
    while cycle < max_cycle:
        if impl == "delta64" and sys.ao is None and not xc_planes_decided:
            # lean-AO endgame residency swap: free the packed f32 planes
            # (the Pallas path never runs again) and materialize the f64
            # planes once, so the remaining f64-XC cycles pay plane-path
            # speed instead of a per-cycle streamed AO re-evaluation.
            # Gated by HBM budget: at 117-atom L1-grid scale the f64
            # planes alone are 6.6 GB and materializing them on top of
            # the resident DF factors OOMs the 16 GB chip -- beyond the
            # budget the endgame keeps the streamed on-device AO path
            # (xc_step_onfly, bitwise-identical values, ~2x XC per call).
            xc_planes_decided = True
            if _xc64_plane_bytes(sys, functional) <= float(os.environ.get(
                    "DFT_DELTA64_PLANES_BYTES", 4.5e9)):
                xc_planes = _materialize_xc_planes(sys, functional)
            else:
                drop_packed(sys)  # Pallas planes are dead weight either way
                # drain in-flight dispatches still referencing them
                # before the anchor build enqueues its own multi-GB work
                float(sys.hcore[0, 0])
        if impl == "delta64" and delta_base is None:
            # entered straight from the pallas phase (xc64_tail='on') or
            # via a stall-triggered RE-ANCHOR (see the delta64 stall
            # detector below): J/K anchors at the CURRENT density.  The
            # round-4 "no refresh is ever needed" claim was wrong at
            # north-star scale: the f32 J/K increments' quantization
            # noise scales with ||dm - dm0||, and with the anchor frozen
            # at the delta64 entry density that floor sat at ~1e-6 in
            # ||dD|| (two L1 re-runs danced at 1-8e-6 for 400 cycles,
            # BASELINE.md round-4 note).  Re-anchoring at the current
            # density collapses the increments -- the map becomes
            # effectively exact and the settle is deterministic.
            delta_base = make_delta_base(sys, functional, dm,
                                         xc_planes=xc_planes,
                                         need_f32=False, need_xc=False)
        if impl == "delta" and (
            delta_base is None or cycles_since_anchor >= delta_refresh
            # optional near-convergence re-anchoring (off by default --
            # see the near_refresh parameter comment: with the ~1e-6
            # aux-major increments each ~1 s f64 re-anchor costs more
            # than the cycles it saves; the knob remains for noisier
            # increment variants, which it was measured to rescue)
            or (near_refresh and cycles_since_anchor >= 2
                and dnorm_prev < 10 * conv_tol_d
                and anchor_dnorm > 10.0 * dnorm_prev)
        ):
            delta_base = make_delta_base(sys, functional, dm,
                                         xc_planes=xc_planes)
            cycles_since_anchor = 0
            anchor_dnorm = dnorm_prev
        phi_split = (phi_split_early and xc_impl == "mixed"
                     and impl == "pallas")
        # the fast J/K (aux-major f32-HIGHEST, ~1e-6 rel, 95x the old
        # layout) are accuracy-clean enough for every mixed phase; delta
        # increments use them unconditionally inside _cycle_tail.  The
        # 'fast' whole-SCF schedule keeps f64 J (see _cycle_tail note).
        if xc_impl == "mixed" and impl == "pallas":
            fast_jk = True
        elif xc_impl == "fast" and impl == "pallas":
            fast_jk = "k"
        else:
            fast_jk = False
        # 'fast' passes the f64 Cholesky factor as a jit argument so the
        # cycle program doesn't embed it alongside the f32 K planes
        # (remote-compile body limit; see SCFSystem.df_b64)
        j_arg = sys.df_b64 if fast_jk == "k" else None
        # aux-major f32 factor for fast J/K and delta increments -- also
        # a jit argument, for the same transport-limit reason
        k_arg = sys.df_bq32
        # J-anchor management for the DF 'fast' phase: the per-cycle f64
        # J matvec was 43 of the 61 ms DHA cycle (the f64 matmul
        # emulation never engages for matvecs); anchoring J at one exact
        # evaluation and applying f32 increments by linearity removes it
        # from the hot loop, with a ~43 ms re-anchor on each dnorm
        # decade so the increment's f32 rounding shrinks with the
        # remaining error (exactly the delta-tail J contract, applied
        # from cycle 0).
        dispatch_base = delta_base
        if xc_impl == "fast" and impl == "pallas" and j_arg is not None:
            if j_anchor is None or dnorm_prev < 0.1 * j_anchor_dn:
                from quantum_compute_dft_tpu.integrals.density_fitting import (
                    _cd_coulomb_q,
                    _cd_coulomb_q_chunked,
                )

                # large factors (north-star scale: nao=377, rank 2150,
                # 2.4 GB f64) anchor through the aux-chunked builder --
                # the monolithic anchor program's emulated-f64 workspace
                # blew the knife-edge HBM budget (round-4 gate: compile
                # OOM at 27 GB), which kept the fastest schedule off the
                # flagship config entirely
                big = j_arg.size * j_arg.dtype.itemsize > 1.0e9
                jb = (_cd_coulomb_q_chunked if big else _cd_coulomb_q)
                j_anchor = (dm, jb(j_arg, dm))
                j_anchor_dn = dnorm_prev
            dispatch_base = j_anchor
        # Block n cycles into one dispatch (see _cycle_block) when the
        # trajectory is smooth: past the first cycle, no level shift
        # active, and below the damping guard's radius -- there the
        # host-side per-cycle interventions cannot fire and the only
        # cost of trailing the stats is <= n-1 cheap extra cycles.
        n = 1
        if (block_cycles > 1 and impl in ("pallas", "delta")
                and not use_adiis and not use_mix
                and cycle >= 1 and shiftc.shift == 0.0
                and dnorm_prev < DAMP_MIN_DNORM):
            n = min(block_cycles, max_cycle - cycle)
        if n > 1:
            packed = _packed_for(sys, functional.needs_grad)
            dm_new, diis, stats_dev = _cycle_block(
                sys, functional, dm, diis, packed, dispatch_base,
                delta=impl == "delta", n_steps=n, shift=shiftc.shift,
                smear_kt=smear_kt, phi_split=phi_split, fast_jk=fast_jk,
                j_arg=j_arg if impl == "pallas" else None, k_arg=k_arg,
            )
            stats = np.asarray(stats_dev)  # ONE fetch for n cycles
        else:
            dm_new, diis, stat_dev = scf_iteration_staged(
                sys, functional, dm, diis, timer=timer, xc_impl=impl,
                delta_base=dispatch_base,
                shift=0.0 if (use_adiis or use_mix) else shiftc.shift,
                smear_kt=smear_kt, phi_split=phi_split, fast_jk=fast_jk,
                j_arg=j_arg, k_arg=k_arg, xc_planes=xc_planes,
                mixer=("adiis" if use_adiis
                       else "mix" if use_mix else "cdiis"),
                mix_alpha=mix_alpha,
            )
            # ONE device->host materialization per cycle: each scalar
            # fetch costs a full round-trip over the TPU tunnel (~33 ms),
            # so e_tot/dnorm (and the callback's breakdown) ride together
            stats = np.asarray(stat_dev)[None, :]
        cycles_since_anchor += n
        block_impl = impl  # the impl every row of this block RAN with
        dnorm_prev_entry = dnorm_prev
        converged_at = None
        shift_acted = False
        delta_fresh_diis = False
        for r in range(stats.shape[0]):
            stat = stats[r]
            e_tot, dnorm = float(stat[0]), float(stat[1])
            eb = EnergyBreakdown(*(float(stat[i]) for i in (0, 2, 3, 4, 5)))
            de = e_tot - e_old
            if callback:
                callback(cycle + r, eb, de, dnorm)
            converged = abs(de) < conv_tol_e and dnorm < conv_tol_d
            # 'fast' E-noise stall: the per-cycle energy in the f32 phase
            # is quantized at the kernel's accumulation floor (~1e-7 Eh
            # class at DHA), so |dE| < 1e-8 only fires when consecutive
            # cycles happen to land on the same quantization plateau -- a
            # LOTTERY that any reassociation of the kernel's sums reroll
            # (observed: the round-4 152-row kernel turned DHA from 46
            # into 104 cycles, ~70 of them spent with ||dD|| already at
            # 1e-7 waiting for an |dE| coincidence).  Once the density
            # has been converged for 8 straight cycles, hand the
            # candidate fixed point to the f64-anchored verify tail --
            # where |dE| is anchored-precise -- instead of waiting.
            # (`fast_verify_pending` in the gate: the |dE|-free shortcut
            # is only sound because the candidate is routed through the
            # f64-anchored verify tail -- never let it produce a final
            # result directly)
            if (xc_impl == "fast" and impl == "pallas"
                    and fast_verify_pending
                    and converged_at is None and not converged):
                fast_dn_streak = (fast_dn_streak + 1
                                  if dnorm < conv_tol_d else 0)
                if fast_dn_streak >= 8:
                    converged = True
            # rows of a mixed-phase pallas block never count as converged
            # (block_impl, not impl: a mid-block switch decision does not
            # change what precision the remaining rows already ran at)
            if (converged and converged_at is None
                    and not (xc_impl == "mixed" and block_impl == "pallas")):
                converged_at = cycle + r + 1
            # stall detector: at large nao the f32 phase's Fock noise
            # floor can sit ABOVE mixed_switch_tol in |dE| -- observed at
            # the 117-atom north star, where dnorm bounced around 1e-3
            # for ~100 cycles before |dE| < 1e-5 happened to fire.  If
            # the best dnorm seen 8+ cycles ago hasn't improved 2x since,
            # the phase is at its noise floor: switch to the f64-anchored
            # delta tail, which converges like the f64 path.
            if xc_impl == "mixed" and impl == "pallas":
                dn_hist.append(dnorm)
                stalled = (len(dn_hist) >= 16 and dnorm < 5e-2
                           and dnorm > 0.5 * min(dn_hist[:-8]))
            else:
                stalled = False
            if xc_impl == "mixed" and impl == "pallas" and (
                cycle + r > 0
                and (converged or abs(de) < mixed_switch_tol or stalled)
            ):
                # f64-anchored f32 increments next block ('on' skips the
                # delta tail entirely and goes straight to the f64-XC
                # endgame -- the plumbing-test mode)
                impl = "delta64" if xc64_tail == "on" else "delta"
                # drop the f32-phase DIIS history at the precision
                # switch: its Fock iterates carry the f32 noise floor,
                # and extrapolating the parity-grade delta Focks against
                # them pins the endgame AT that floor (observed at the
                # 117-atom north star: 160 post-switch cycles grinding
                # from 1e-3 to 1e-5, vs 51 total for the all-f64 mesh
                # run whose history was precision-consistent)
                delta_fresh_diis = True
            # delta-phase stall detector -> f64-XC endgame: when the best
            # ||dD|| seen 8+ cycles ago hasn't improved 2x since, the
            # tail sits at its f32-XC-difference noise floor (scales with
            # nao; ~1e-5 at the 117-atom north star, which bounced there
            # for 200+ cycles).  Switch XC to the f64 engine per cycle
            # (J/K stay anchored -- exact by linearity) and drop the
            # noise-floor DIIS history.
            if (xc_impl in ("mixed", "fast") and impl == "delta"
                    and xc64_tail == "auto"):
                dn_hist64.append(dnorm)
                if (len(dn_hist64) >= 16 and dnorm < 1e-3
                        and dnorm > conv_tol_d
                        and dnorm > 0.5 * min(dn_hist64[:-8])):
                    impl = "delta64"
                    delta_fresh_diis = True
                    # drop the delta tail's anchor: it may be up to
                    # delta_refresh cycles stale, and the endgame's
                    # noise floor is set by ||dm - dm0|| (see the
                    # delta64 re-anchor note at the base build)
                    delta_base = None
            # delta64-phase stall detector -> RE-ANCHOR: when the best
            # ||dD|| seen 8+ cycles ago hasn't improved 2x since, the
            # endgame sits at the noise floor of its f32 J/K increments
            # (~ f32 quantization of ||dm - dm0||-sized quantities --
            # non-smooth in dm, so CDIIS cannot extrapolate through it).
            # Rebuild the J/K anchors at the CURRENT density and drop
            # the noise-floor DIIS history: the increments collapse to
            # ~||dD||-sized, their noise to O(1e-6 * ||dD||), and the
            # now-effectively-exact map settles decisively below the
            # criterion instead of dancing at 1-8e-6 (the round-4 L1
            # boundary lottery, BASELINE.md).
            if impl == "delta64" and delta_base is not None:
                dn_hist_d64.append(dnorm)
                if (d64_reanchors < D64_REANCHOR_MAX
                        and len(dn_hist_d64) >= 12
                        and dnorm < 1e-4 and dnorm > conv_tol_d
                        and dnorm > 0.5 * min(dn_hist_d64[:-6])):
                    delta_base = None   # re-anchor at dm_new next pass
                    d64_reanchors += 1
                    dn_hist_d64 = []
                    delta_fresh_diis = True
            # feed the controller until its FIRST action in this block:
            # rows after an engage/escalate/release ran under the OLD
            # shift, and feeding them would e.g. release a shift that
            # never applied (engage at row r, dnorm already below
            # SHIFT_RELEASE at row r+1) -- the next iteration runs
            # per-cycle (shift > 0 disables blocking) with true dynamics
            if use_adiis and dnorm < ADIIS_TO_CDIIS:
                use_adiis = False
                diis = diis_init(dm.shape[0])  # CDIIS endgame, fresh
            if use_mix and "+" in mixer and dnorm < MIX_TO_CDIIS:
                use_mix = False  # CDIIS takes over; history is empty
            if not use_adiis and not use_mix and not shift_acted:
                fresh_diis = shiftc.update(cycle + r, dnorm)
                if fresh_diis is not None:
                    diis = fresh_diis
                    shift_acted = True
            dnorm_prev = dnorm
            e_old = e_tot
        if converged_at is not None and fast_verify_pending:
            # an all-f32 fixed point can be SPURIOUS: steep heavy-element
            # Fock scales (Se/Br 1s ~ -500 Eh) push the f32 rounding
            # floor above the convergence window, so successive iterates
            # go bitwise-stationary (|dE| = ||dD|| = 0) up to ~1e-4 Eh
            # from the f64 fixed point (observed: H2Se -1.2e-4, HBr
            # +2.3e-4 after 4 "converged" cycles, while SeO3's genuine
            # 28-cycle fixed point sat at 9e-9).  Verify by re-converging
            # on the f64-anchored delta tail from this density: genuine
            # fixed points pass in O(1) cheap cycles, spurious ones walk
            # to parity.
            fast_verify_pending = False
            impl = "delta"
            delta_base = None           # fresh f64 anchor at dm_new
            cycles_since_anchor = 0
            use_adiis = False
            use_mix = False
            diis = diis_init(dm.shape[0])  # f32-floor history is noise
            dm = dm_new
            cycle += n
            continue
        if converged_at is not None:
            if block_impl in ("delta", "delta64") or xc_impl == "fast":
                # report parity-grade energies: one full f64 evaluation
                # of the density actually returned (end of block --
                # past convergence every extra cycle stays at the fixed
                # point to the convergence tolerance)
                eb_dev = energy_of_dm(sys, functional, dm_new,
                                      xc_planes=xc_planes)
                stat = np.asarray(jnp.stack(list(eb_dev)))
                eb = EnergyBreakdown(*(float(v) for v in stat))
                e_tot = eb.e_tot
            return SCFResult(True, converged_at, dm_new, eb, e_tot,
                             level_shift=shiftc.shift,
                             shift_engaged_at=shiftc.engaged_at,
                             d64_reanchors=d64_reanchors)
        if delta_fresh_diis and not shift_acted:
            use_adiis = False
            use_mix = False
            diis = diis_init(dm.shape[0])  # see the switch-branch note
        if (n == 1 and dnorm > DAMP_MIN_DNORM
                and dnorm >= DAMP_RATIO * dnorm_prev_entry):
            dm_new = 0.5 * (dm_new + dm)  # see DAMP_* note above
        dm = dm_new
        cycle += n
        if (checkpoint_cb is not None and checkpoint_every > 0
                and cycle // checkpoint_every
                    > (cycle - n) // checkpoint_every):
            checkpoint_cb(cycle, np.asarray(dm), e_old)
    if max_cycle > 0:
        # the loop's last eb was computed from the pre-damping dm_new;
        # report the energy of the density actually returned
        eb_dev = energy_of_dm(sys, functional, dm, xc_planes=xc_planes)
        eb = EnergyBreakdown(*(float(v) for v in
                               np.asarray(jnp.stack(list(eb_dev)))))
        e_tot = eb.e_tot
    return SCFResult(False, max_cycle, dm, eb, e_tot,
                     level_shift=shiftc.shift,
                     shift_engaged_at=shiftc.engaged_at,
                     d64_reanchors=d64_reanchors)


def scf_host_annealed(
    sys: SCFSystem,
    functional: Functional,
    kts: tuple[float, ...] = (0.5, 0.35, 0.25, 0.2, 0.15, 0.1),
    runner: Callable | None = None,
    finish_integer: bool = True,
    rung_conv_tol_e: float | None = None,
    rung_conv_tol_d: float | None = None,
    **kwargs,
) -> SCFResult:
    """FON-RKS annealing ladder: converge at the hottest electronic
    temperature (always smooth), then re-converge at each colder kT
    warm-started from the previous density.  The recipe for systems
    whose integer-occupation SCF has no reachable fixed point (CuO: a
    d-shell doublet; charge-sloshes forever with integer occupations).
    How cold the ladder reaches is grid-dependent -- CuO/B3LYP converges
    down to kT 0.2 at grid level 1 but stalls below 0.5 at level 3 with
    a 2-rung ladder; the finer rungs recover the descent.  Returns the
    result at the COLDEST kT that converged (its `smear_kt` field says
    which); rungs below the first failure are not attempted.

    `finish_integer`: after the coldest converged rung, attempt one
    integer-occupation (kT=0) run warm-started from its density, and
    return THAT when it converges (smear_kt=0.0).  Gapped systems that
    merely stalled from a bad cold start (oscillating DIIS history)
    recover their exact integer-occupation energy this way instead of
    reporting a finite-temperature one; genuinely degenerate systems
    (CuO) fail the attempt and fall back to the smeared result.

    `runner` is the SCF loop to drive (default scf_host; pass
    scf_host_staged for the TPU dispatch-fused variant)."""
    run = runner if runner is not None else scf_host
    best = None
    dm0 = kwargs.pop("dm0", None)
    # rung_conv_tol_*: smeared rungs only need to GUIDE the density to
    # the colder rung's basin -- loosened rung tolerances cut the hot
    # rungs' cost, while the integer finish keeps the caller's full
    # convergence rule (a smeared result returned because the finish
    # failed is converged to the RUNG tolerance; callers that loosen it
    # should re-verify the coldest rung at full tolerance)
    rung_kw = dict(kwargs)
    if rung_conv_tol_e is not None:
        rung_kw["conv_tol_e"] = rung_conv_tol_e
    if rung_conv_tol_d is not None:
        rung_kw["conv_tol_d"] = rung_conv_tol_d
    for kt in kts:
        r = run(sys, functional, smear_kt=kt, dm0=dm0, **rung_kw)
        r.smear_kt = kt
        if not r.converged:
            break
        best = r
        dm0 = r.dm
    if best is not None and finish_integer:
        mc = kwargs.pop("max_cycle", MAX_CYCLE)
        ri = run(sys, functional, smear_kt=0.0, dm0=best.dm,
                 max_cycle=min(mc, 100), **kwargs)
        if ri.converged:
            ri.smear_kt = 0.0
            return ri
    return best if best is not None else r


@dataclasses.dataclass
class SCFResult:
    converged: bool
    n_iter: int
    dm: jnp.ndarray
    energy: EnergyBreakdown
    e_tot: float
    # convergence-control observability (tests assert these): the final
    # level-shift sigma and the cycle where it first engaged (None = never)
    level_shift: float = 0.0
    shift_engaged_at: int | None = None
    # electronic temperature this result was converged at (0 = integer
    # occupations); set by scf_host_annealed so callers can report the
    # coldest rung that actually converged
    smear_kt: float = 0.0
    # delta64 endgame: stall-triggered J/K re-anchor count (tests and
    # the north-star runs assert the boundary-lottery fix engaged)
    d64_reanchors: int = 0


def scf_host(
    sys: SCFSystem,
    functional: Functional,
    callback: Callable | None = None,
    max_cycle: int = MAX_CYCLE,
    conv_tol_e: float = CONV_TOL_E,
    conv_tol_d: float = CONV_TOL_D,
    dm0: jnp.ndarray | None = None,
    smear_kt: float = 0.0,
    mixer: str = "cdiis",
    mix_alpha: float = 0.2,
) -> SCFResult:
    """smear_kt > 0 runs FON-RKS (Fermi-smeared occupations at that
    electronic temperature in Eh) -- the robust treatment for
    near-degenerate frontier manifolds; see _fermi_density.

    mixer='adiis+cdiis' starts with energy-based ADIIS (configuration-
    slosh-proof; see scf.diis) and hands over to CDIIS once ||dD|| drops
    below ADIIS_TO_CDIIS -- the robust strategy for hard cases like
    CuO/B3LYP.

    TPU-shape limit: scf_iteration takes SCFSystem as a STATIC jit arg,
    and this JAX version lowers closure-captured device arrays to inline
    MLIR literals -- the remote compile request then carries the full
    f64 AO planes and the TPU tunnel rejects bodies past its HTTP limit
    (413) once the planes exceed ~100 MB (measured: CuO 26 MB compiles;
    Ca3P2 193 MB / ABAQ 918 MB do not).  At those shapes run the ladder
    through scf_host_staged (runner=... in scf_host_annealed), whose
    programs take the planes as runtime arguments."""
    import numpy as np

    dm = initial_guess(sys) if dm0 is None else jnp.asarray(dm0)
    use_adiis = mixer.startswith("adiis")
    use_mix = mixer.startswith("mix")  # damped linear mixing phase
    diis = (adiis_init if use_adiis else diis_init)(dm.shape[0])
    shiftc = _ShiftController(dm.shape[0])
    e_old = 0.0
    dnorm_prev = float("inf")
    eb = EnergyBreakdown(*(float("nan"),) * 5)  # bound even at max_cycle=0
    e_tot = float("nan")
    for cycle in range(max_cycle):
        dm_new, diis, eb = scf_iteration(
            sys, functional, dm, diis,
            shift=0.0 if (use_adiis or use_mix) else shiftc.shift,
            smear_kt=smear_kt,
            mixer=("adiis" if use_adiis
                   else "mix" if use_mix else "cdiis"),
            mix_alpha=mix_alpha,
        )
        # one materialization per cycle (see scf_host_staged)
        stat = np.asarray(jnp.stack(
            [eb.e_tot, jnp.linalg.norm(dm_new - dm),
             eb.e_one, eb.e_coul, eb.e_xc, eb.e_ex_hf]
        ))
        e_tot, dnorm = float(stat[0]), float(stat[1])
        eb = EnergyBreakdown(*(float(stat[i]) for i in (0, 2, 3, 4, 5)))
        de = e_tot - e_old
        if callback:
            callback(cycle, eb, de, dnorm)
        if abs(de) < conv_tol_e and dnorm < conv_tol_d:
            return SCFResult(True, cycle + 1, dm_new, eb, e_tot,
                             level_shift=shiftc.shift,
                             shift_engaged_at=shiftc.engaged_at)
        if use_adiis and dnorm < ADIIS_TO_CDIIS:
            use_adiis = False
            diis = diis_init(dm.shape[0])  # CDIIS endgame, fresh history
        # the host loop's dnorm is the BLENDED step during mixing
        # (alpha x the raw map residual) -- rescale for the handover
        if (use_mix and "+" in mixer
                and dnorm / mix_alpha < MIX_TO_CDIIS):
            use_mix = False  # CDIIS takes over; history is empty
        if not use_adiis and not use_mix:
            fresh_diis = shiftc.update(cycle, dnorm)
            if fresh_diis is not None:
                diis = fresh_diis
        if dnorm > DAMP_MIN_DNORM and dnorm >= DAMP_RATIO * dnorm_prev:
            dm_new = 0.5 * (dm_new + dm)  # see DAMP_* note above
        dnorm_prev = dnorm
        dm = dm_new
        e_old = e_tot
    if max_cycle > 0:
        # see scf_host_staged: report the energy of the returned density
        eb_dev = energy_of_dm(sys, functional, dm)
        eb = EnergyBreakdown(*(float(v) for v in
                               np.asarray(jnp.stack(list(eb_dev)))))
        e_tot = eb.e_tot
    return SCFResult(False, max_cycle, dm, eb, e_tot,
                     level_shift=shiftc.shift,
                     shift_engaged_at=shiftc.engaged_at)


@functools.partial(jax.jit, static_argnames=("sys", "functional", "max_cycle"))
def scf_jit(
    sys: SCFSystem,
    functional: Functional,
    max_cycle: int = MAX_CYCLE,
):
    """Whole SCF as one lax.while_loop on device; returns final state."""
    dm0 = initial_guess(sys)
    diis0 = diis_init(dm0.shape[0])
    zero = jnp.asarray(0.0)
    eb0 = EnergyBreakdown(zero, zero, zero, zero, zero)

    def cond(carry):
        dm, diis, eb, e_old, dnorm, cycle, done = carry
        return (~done) & (cycle < max_cycle)

    def body(carry):
        dm, diis, eb_prev, e_old, dnorm_prev, cycle, _ = carry
        dm_new, diis, eb = scf_iteration(sys, functional, dm, diis)
        de = eb.e_tot - e_old
        dnorm = jnp.linalg.norm(dm_new - dm)
        done = (jnp.abs(de) < CONV_TOL_E) & (dnorm < CONV_TOL_D)
        dm_new = _damp(dm_new, dm, dnorm, dnorm_prev)
        return (dm_new, diis, eb, eb.e_tot, dnorm, cycle + 1, done)

    carry = (dm0, diis0, eb0, zero, jnp.asarray(jnp.inf),
             jnp.array(0, jnp.int32), jnp.array(False))
    dm, diis, eb, _, dnorm, n_iter, done = jax.lax.while_loop(cond, body, carry)
    return dm, eb, n_iter, done
