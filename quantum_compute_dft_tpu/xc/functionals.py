"""Exchange-correlation functional library (closed-shell / RKS).

Pure-JAX energy densities with potentials by automatic differentiation:
for f(rho, sigma) = rho * eps_xc(rho, sigma),

    vrho   = df/drho,      vsigma = df/dsigma,

which is mathematically identical to the reference's hand-derived
potentials (ref src/dft_solver.cu:61-283) but immune to transcription
errors; finite-difference tests pin both (tests/test_xc.py).

Functionals and constants exactly as the reference engine:
  slater_x            Cx = 0.7385587663820224          (dft_solver.cu:61-67)
  vwn5_c              A=0.0310907 b=3.72744 c=12.9352 x0=-0.10498
                                                        (dft_solver.cu:21-24,180-205)
  vwn_rpa_c (VWN3)    A=0.0310907 b=13.0720 c=42.7198 x0=-0.409286
                                                        (dft_solver.cu:38-41,106-138)
  pw92_c              A=0.03109069086965489503, alpha1=0.21370,
                      beta=7.5957/3.5876/1.6382/0.49294 (dft_solver.cu:25-31,207-220)
  pbe_x               kappa=0.804, mu=0.2195149727645171 (dft_solver.cu:222-242)
  pbe_c               beta=0.066725, gamma=A_pw92        (dft_solver.cu:244-283)
  b88_x (correction)  beta=0.0042                        (dft_solver.cu:78-104)
  lyp_c               A=0.04918 B=0.132 C=0.2533 D=0.349,
                      CF=2.87123400018819108             (dft_solver.cu:45-49,140-178)

B3LYP mix (Gaussian convention, VWN-RPA):
  eps_xc = 0.80 eps_x^Slater + 0.72 eps_x^B88 + 0.19 eps_c^VWN-RPA
           + 0.81 eps_c^LYP                              (dft_solver.cu:33-36,476-479)
with B88 evaluated spin-resolved as b88(rho/2, sigma/4) (dft_solver.cu:458-468)
and 20% exact exchange applied in the SCF driver (ref dft.py:197,221).
"""

from __future__ import annotations

import dataclasses
from math import pi

import jax
import jax.numpy as jnp

# Density/sigma floors.  The reference uses 1e-12 / 1e-20 in native-f64
# CUDA (dft_solver.cu:12-13); here they are raised to 1e-10 / 1e-18 because
# TPU "f64" is float-float emulation with an f32 exponent RANGE -- autodiff
# chains like rho**(-11/3) overflow past ~1e38 and poison vrho with NaNs at
# the tighter floors.  The energy effect is below 1e-9 Eh (contributions
# scale as w * rho * eps at rho < 1e-10).
RHO_EPS = 1e-10
MIN_GRAD = 1e-18

# ---------------------------------------------------------------------------
# Lowering-safe transcendentals.  Pallas/Mosaic TPU has no atan/asinh/expm1
# primitives, so these are built from exp/log/sqrt compositions, accurate to
# ~1e-14 (tests/test_xc.py) and used on every path (CPU f64 included) so the
# functional code stays engine-agnostic.
# ---------------------------------------------------------------------------


def _expm1(x):
    """exp(x)-1 without the expm1 primitive; series below |x|=1e-4."""
    series = x * (1.0 + x * (0.5 + x * (1.0 / 6.0 + x / 24.0)))
    return jnp.where(jnp.abs(x) < 1e-4, series, jnp.exp(x) - 1.0)


def _asinh_pos(x):
    """asinh for x >= 0: log1p-stable form."""
    return jnp.log1p(x + x * x / (1.0 + jnp.sqrt(1.0 + x * x)))


def _atan_pos(z):
    """atan for z >= 0 via 3 half-angle reductions + Taylor (|err| ~ 1e-13)."""
    for _ in range(3):
        z = z / (1.0 + jnp.sqrt(1.0 + z * z))
    z2 = z * z
    s = 1.0 / 15.0
    for k in (13, 11, 9, 7, 5, 3):
        s = 1.0 / k - z2 * s
    s = 1.0 - z2 * s
    return 8.0 * z * s


# ---------------------------------------------------------------------------
# LDA pieces: eps(rho)
# ---------------------------------------------------------------------------

_CX = 0.7385587663820224  # (3/4)(3/pi)^(1/3)


def slater_x(rho):
    return -_CX * rho ** (1.0 / 3.0)


def _vwn_eps(rho, A, b, c, x0):
    rs = (3.0 / (4.0 * pi * rho)) ** (1.0 / 3.0)
    x = jnp.sqrt(rs)
    X = x * x + b * x + c
    Q = jnp.sqrt(4.0 * c - b * b)
    X0 = x0 * x0 + b * x0 + c
    atan_term = _atan_pos(Q / (2.0 * x + b))
    return A * (
        jnp.log(x * x / X)
        + 2.0 * b / Q * atan_term
        - b * x0 / X0
        * (jnp.log((x - x0) ** 2 / X) + 2.0 * (2.0 * x0 + b) / Q * atan_term)
    )


def vwn5_c(rho):
    """VWN5 paramagnetic correlation (the reference LDA path)."""
    return _vwn_eps(rho, 0.0310907, 3.72744, 12.9352, -0.10498)


def vwn_rpa_c(rho):
    """VWN-RPA (a.k.a. VWN3) -- the Gaussian-convention B3LYP ingredient."""
    return _vwn_eps(rho, 0.0310907, 13.0720, 42.7198, -0.409286)


_A_PW92 = 0.03109069086965489503


def pw92_c(rho):
    rs = (3.0 / (4.0 * pi * rho)) ** (1.0 / 3.0)
    srs = jnp.sqrt(rs)
    q = 2.0 * _A_PW92 * (
        7.5957 * srs + 3.5876 * rs + 1.6382 * rs * srs + 0.49294 * rs * rs
    )
    return -2.0 * _A_PW92 * (1.0 + 0.21370 * rs) * jnp.log(1.0 + 1.0 / q)


# ---------------------------------------------------------------------------
# GGA pieces: eps(rho, sigma)
# ---------------------------------------------------------------------------


def pbe_x(rho, sigma):
    kappa, mu = 0.804, 0.2195149727645171
    kf = (3.0 * pi * pi * rho) ** (1.0 / 3.0)
    # s = |grad rho| / (2 kf rho), assembled as a single ratio so autodiff
    # never squares a denormal-scale denominator (f32 Pallas path safety)
    s = jnp.sqrt(sigma) / (2.0 * kf * rho)
    s2 = jnp.minimum(s * s, 1e12)
    F = 1.0 + kappa * (1.0 - 1.0 / (1.0 + mu * s2 / kappa))
    return -_CX * rho ** (1.0 / 3.0) * F


def pbe_c(rho, sigma):
    beta, gamma_ = 0.066725, _A_PW92
    # clamps follow the reference (1e20, dft_solver.cu:256,260) in f64; the
    # f32 Pallas path needs tighter ones so A*t2 squared stays finite -- H
    # is already saturated far below either bound, so results are unchanged
    big = 1e20 if jnp.result_type(rho) == jnp.float64 else 1e8
    ec_lda = pw92_c(rho)
    kf = (3.0 * pi * pi * rho) ** (1.0 / 3.0)
    # t = sqrt(sigma pi) / (4 sqrt(kf) rho): single well-scaled ratio (see
    # pbe_x note on f32 autodiff safety)
    t = jnp.sqrt(sigma * pi) / (4.0 * jnp.sqrt(kf) * rho)
    t2 = jnp.minimum(t * t, big)
    expm1x = _expm1(-ec_lda / gamma_)
    tiny = 1.0 / big
    A = (beta / gamma_) / jnp.where(
        jnp.abs(expm1x) < tiny, jnp.sign(expm1x) * tiny + tiny * 1e-8, expm1x
    )
    A = jnp.minimum(A, big)
    at2 = A * t2
    Q = (1.0 + at2) / (1.0 + at2 + at2 * at2)
    H = gamma_ * jnp.log(1.0 + (beta / gamma_) * t2 * Q)
    return ec_lda + H


_BETA_B88 = 0.0042


def b88_x_corr(rho_s, sigma_s):
    """B88 exchange *correction* per spin channel, eps per electron of the
    channel density rho_s (the Slater part is separate)."""
    rho43 = rho_s ** (4.0 / 3.0)
    # clamp the reduced gradient: x^2 overflows f32 past ~1e19, and the
    # correction is asymptotically ~ -x/(6 asinh x) there anyway -- only
    # negligible-density points ever reach the clamp
    xmax = 1e15 if jnp.result_type(rho_s) == jnp.float64 else 1e8
    x = jnp.minimum(jnp.sqrt(sigma_s) / rho43, xmax)
    denom = 1.0 + 6.0 * _BETA_B88 * x * _asinh_pos(x)
    return -_BETA_B88 * x * x / denom * rho_s ** (1.0 / 3.0)


def lyp_c(rho, sigma):
    A, B, C, D = 0.04918, 0.132, 0.2533, 0.349
    CF = 2.87123400018819108
    rm13 = rho ** (-1.0 / 3.0)
    rm53 = rm13 ** 5
    expv = jnp.exp(-C * rm13)
    deninv = 1.0 / (1.0 + D * rm13)
    G = expv * deninv
    delta = C * rm13 + D * rm13 * deninv
    H1 = -A * rho * deninv
    H2a = -A * B * CF * rho * G
    H2b = (A * B / 72.0) * sigma * rm53 * G * (3.0 + 7.0 * delta)
    return (H1 + H2a + H2b) / rho


# ---------------------------------------------------------------------------
# Composed functionals with autodiff potentials
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Functional:
    """A closed-shell XC functional: f(rho, sigma) -> energy density rho*eps.

    needs_grad: whether sigma (and AO gradients) are required.
    hyb_coeff:  fraction of exact exchange mixed in by the SCF driver
                (ref dft.py:197: c_hf = 0.2 for B3LYP).
    """

    name: str
    f: callable
    needs_grad: bool
    hyb_coeff: float = 0.0

    def exc_vxc(self, rho, sigma=None):
        """-> (e = rho*eps, vrho, vsigma) with the reference floors applied."""
        rho_s = jnp.maximum(rho, RHO_EPS)
        live = rho > RHO_EPS
        if self.needs_grad:
            sig_s = jnp.maximum(sigma, MIN_GRAD)
            e, (vr, vs) = jax.vmap(jax.value_and_grad(self.f, argnums=(0, 1)))(
                rho_s, sig_s
            )
            zero = jnp.zeros_like(rho)
            return (
                jnp.where(live, e, zero),
                jnp.where(live, vr, zero),
                jnp.where(live & (sigma > MIN_GRAD), vs, zero),
            )
        e, vr = jax.vmap(jax.value_and_grad(self.f))(rho_s)
        zero = jnp.zeros_like(rho)
        return jnp.where(live, e, zero), jnp.where(live, vr, zero), None


def _f_lda(rho):
    return rho * (slater_x(rho) + vwn5_c(rho))


def _f_pbe(rho, sigma):
    return rho * (pbe_x(rho, sigma) + pbe_c(rho, sigma))


def _f_b3lyp(rho, sigma):
    eps = (
        0.80 * slater_x(rho)
        + 0.72 * b88_x_corr(0.5 * rho, 0.25 * sigma)
        + 0.19 * vwn_rpa_c(rho)
        + 0.81 * lyp_c(rho, sigma)
    )
    return rho * eps


def _f_zero(rho):
    return jnp.zeros_like(rho)


LDA = Functional("LDA", _f_lda, needs_grad=False)
GGA = Functional("GGA", _f_pbe, needs_grad=True)   # PBE, matching the ref name
B3LYP = Functional("B3LYP", _f_b3lyp, needs_grad=True, hyb_coeff=0.2)
# Hartree-Fock as the degenerate functional (100% exact exchange, no XC) --
# not in the reference, but it pins the SCF machinery against exact
# literature energies and costs nothing.
HF = Functional("HF", _f_zero, needs_grad=False, hyb_coeff=1.0)

FUNCTIONALS = {"LDA": LDA, "GGA": GGA, "PBE": GGA, "B3LYP": B3LYP, "HF": HF}
