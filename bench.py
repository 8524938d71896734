"""Benchmark entry point -- prints ONE JSON line.

Headline metric (BASELINE.json): Benzene PBE SCF wall-clock to the
reference convergence criteria (|dE| < 1e-8, ||dD|| < 1e-6; ref
dft.py:243), measured on the SCF loop only (the reference's "Total Time",
ref dft.py:245,258), after a warm-up run that pays compilation.  Also
reports the per-call XC build time (the reference's "XC(Exc+Vxc) Time",
ref dft.py:246-261) for the engine that actually ran the SCF, plus its
achieved FLOP rate and MXU utilization (pallas_mfu) against the chip's
f32 peak.

Setup (integrals, grids, AO values) and the SCF hot loop both run on the
default device (TPU when present), as the CLI does.  Molecules above
nao ~ 110 automatically use the density-fitted Fock build (the in-core
(nao^4) ERI the reference requires cannot exist at DHA scale).
vs_baseline is the speedup vs the reference's published number -- the
reference publishes none (BASELINE.md), so the first recorded round is
the baseline (1.0) and later rounds compare against BENCH_r1.

Env knobs: BENCH_MOLECULE, BENCH_FUNCTIONAL, BENCH_GRID_LEVEL,
BENCH_XC_IMPL (f64|pallas|mixed|fast), BENCH_BASELINE_S, BENCH_PEAK_TFLOPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "DFT_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax

MOLECULE = os.environ.get("BENCH_MOLECULE", "Benzene")
FUNCTIONAL = os.environ.get("BENCH_FUNCTIONAL", "GGA")
GRID_LEVEL = int(os.environ.get("BENCH_GRID_LEVEL", "3"))
BASELINE_S = os.environ.get("BENCH_BASELINE_S")  # optional reference seconds

# f32 matmul peak per chip generation (TFLOP/s); MFU denominators.
# Overridable with BENCH_PEAK_TFLOPS for new device kinds.
_PEAK_F32_TFLOPS = [
    ("v5 lite", 98.5),   # v5e: 197 bf16 TFLOP/s, f32 = half
    ("v5e", 98.5),
    ("v5p", 229.0),
    ("v6e", 459.0),
    ("v6", 459.0),
    ("v5", 229.0),
    ("v4", 137.0),
    ("v3", 61.0),
    ("v2", 23.0),
]


def _peak_tflops() -> float:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    kind = jax.devices()[0].device_kind.lower()
    for key, val in _PEAK_F32_TFLOPS:  # most-specific first
        if key in kind:
            return val
    return 137.0  # assume v4-class if unrecognized


def _xc_flops(g: int, n: int, needs_grad: bool) -> int:
    """Useful (unpadded) FLOPs of one fused XC build: the two (g, n) x
    (n, n) GEMMs (phi_D = AO D and V = AO^T B) plus the O(g n) row work
    (rho, grad-rho dots, B assembly).  Transcendental functional math is
    O(g) and excluded."""
    gemms = 4 * g * n * n
    row = (20 if needs_grad else 6) * g * n
    return gemms + row


def main() -> int:
    t_all = time.time()

    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.scf.driver import scf_host_staged
    from quantum_compute_dft_tpu.engine.xc_engine import xc_step
    from quantum_compute_dft_tpu.utils.profiling import PhaseTimer

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "molecules", MOLECULE + ".xyz")
    mol = from_xyz_file(path)
    density_fit = None  # auto: in-core below nao ~ 110, DF above
    if os.environ.get("BENCH_DF"):
        density_fit = os.environ["BENCH_DF"] == "1"
    # Setup device: the in-core quartet path is many small dispatches --
    # cheaper on the host CPU than through the TPU tunnel (measured 58 s
    # vs 351 s for benzene).  DF/Cholesky builds batch large fixed-shape
    # panels and their downstream SCF tensors are big, so large (DF-mode)
    # molecules set up on the accelerator like the CLI does.
    from quantum_compute_dft_tpu.basis import build_basis

    nao = build_basis(mol).nao
    df_mode = (density_fit if density_fit is not None
               else nao > kohn_sham.AUTO_DF_NAO)
    import contextlib

    ctx = (contextlib.nullcontext() if df_mode or jax.default_backend() == "cpu"
           else jax.default_device(jax.devices("cpu")[0]))
    with ctx:
        setup = kohn_sham.prepare(
            mol, FUNCTIONAL, grid_level=GRID_LEVEL, density_fit=density_fit,
            df_aux=os.environ.get("BENCH_DF_AUX", "parity"),
        )
    if not df_mode and jax.default_backend() != "cpu":
        # re-place the CPU-built system on the accelerator
        import numpy as np
        from quantum_compute_dft_tpu.scf.driver import make_system

        setup.sys = make_system(
            np.asarray(setup.sys.hcore), np.asarray(setup.sys.s),
            np.asarray(setup.sys.eri), np.asarray(setup.sys.ao),
            np.asarray(setup.sys.weights),
            None if setup.sys.ao_grad is None else np.asarray(setup.sys.ao_grad),
            setup.sys.e_nuc, setup.sys.nocc,
            sad_occ=None if setup.sys.dm_sad is None
            else np.asarray(setup.sys.dm_sad).diagonal(),
            nopen=setup.sys.nopen,  # odd-electron FON-RKS count
        )
    sys_dev = setup.sys

    # warm-up (compile; staged dispatches keep the remote TPU compiler
    # fast); the per-phase timer lives here because fenced phases cost a
    # host<->device round-trip each -- the timed run below is fully async
    xc_impl = os.environ.get("BENCH_XC_IMPL", "fast")
    if jax.default_backend() == "cpu":
        xc_impl = "f64"  # the Pallas kernel is TPU-only
    switch_tol = float(os.environ.get("BENCH_SWITCH_TOL", "1e-5"))
    timer = PhaseTimer()
    res = scf_host_staged(sys_dev, setup.functional, timer=timer,
                          xc_impl=xc_impl, mixed_switch_tol=switch_tol)

    # timed SCF (the reference's "Total Time", ref dft.py:245)
    t0 = time.time()
    res = scf_host_staged(sys_dev, setup.functional, xc_impl=xc_impl,
                          mixed_switch_tol=switch_tol)
    scf_s = time.time() - t0
    dm, eb, n_iter, done = res.dm, res.energy, res.n_iter, res.converged

    # XC per-call statistic on the converged density, timing the engine
    # that the SCF actually used (--xc-impl), not unconditionally f64
    use_pallas = xc_impl in ("pallas", "mixed", "fast")
    if use_pallas:
        from quantum_compute_dft_tpu.engine.pallas_xc import xc_step_pallas

        xc_fn = xc_step_pallas
    else:
        xc_fn = xc_step

    def _time_xc(fn, reps, functional=None, dmx=None, args=None):
        """block_until_ready is a NO-OP on axon arrays (verify skill);
        the only real sync is materialization, so all reps chain into one
        scalar fetched once, minus the ~33 ms round-trip."""
        functional = functional or setup.functional
        dmx = dmx if dmx is not None else dm
        args = args or (sys_dev.ao, sys_dev.weights, sys_dev.ao_grad)
        exc, vxc = fn(functional, dmx, *args)
        _ = float(exc)
        t0 = time.time()
        tot = None
        for _i in range(reps):
            exc, vxc = fn(functional, dmx, *args)
            tot = exc if tot is None else tot + exc
        _ = float(tot)
        return max(time.time() - t0 - 0.033, 1e-9) / reps * 1000.0

    xc_ms = _time_xc(xc_fn, 20)

    G, N = sys_dev.ao.shape
    flops = _xc_flops(G, N, setup.functional.needs_grad)
    gflops = flops / (xc_ms / 1000.0) / 1e9
    extra = {
        "e_tot": round(float(eb.e_tot), 8),
        "converged": bool(done),
        "n_iter": int(n_iter),
        "nao": int(N),
        "ngrid": int(G),
        "density_fit": bool(sys_dev.eri is None),
        "xc_ms_per_call": round(xc_ms, 3),
        "xc_gflops": round(gflops, 2),
        "xc_impl": xc_impl,
        "xc_engine_timed": "pallas f32" if use_pallas else "jnp f64",
        "device": str(jax.devices()[0]),
        "setup_s": round(setup.build_time, 2),
        "total_s": None,  # filled below
    }
    if use_pallas:
        extra["pallas_mfu"] = round(gflops / (_peak_tflops() * 1e3), 4)
        extra["peak_f32_tflops"] = _peak_tflops()
        # the packed-input variant is what the SCF hot loop actually runs
        # (the standalone number above includes the per-call f64->f32
        # transpose of the AO planes)
        from quantum_compute_dft_tpu.engine.pallas_xc import (
            pack_pallas_inputs,
            xc_step_pallas_packed,
        )

        packed = pack_pallas_inputs(sys_dev.ao, sys_dev.weights,
                                    sys_dev.ao_grad,
                                    n_grad=setup.functional.needs_grad)

        def _packed_call(functional, dmx, *_):
            return xc_step_pallas_packed(functional, dmx, packed[0],
                                         packed[1], packed[2], N)

        packed_ms = _time_xc(_packed_call, 20)
        extra["xc_ms_per_call_packed"] = round(packed_ms, 3)
        extra["pallas_mfu_packed"] = round(
            flops / (packed_ms / 1000.0) / 1e9 / (_peak_tflops() * 1e3), 4
        )
        # honest ceiling for this kernel: HBM bandwidth, not the MXU
        # (BASELINE.md roofline analysis) -- report achieved GB/s too
        nplanes = 4 if setup.functional.needs_grad else 1
        npad = (N + 127) // 128 * 128
        gpad = packed[0].shape[1]
        mb = nplanes * npad * gpad * 4 / 1e6
        extra["xc_bw_gbs"] = round(mb / packed_ms, 1)
        extra["xc_bw_frac_819"] = round(mb / packed_ms / 819.0, 3)
        # the f64 number too, for the parity-path record
        f64_ms = _time_xc(xc_step, 5)
        extra["xc_ms_per_call_f64"] = round(f64_ms, 3)

        # DHA-shape kernel row (VERDICT r2 item 5): the nao=152/pad-256
        # number is the honest large-molecule one; benzene's nao=36 pads
        # to 128 and overstates the waste
        if MOLECULE != "DHA" and os.environ.get("BENCH_DHA_SHAPE", "1") == "1":
            try:
                from quantum_compute_dft_tpu.scf.driver import initial_guess

                dha = kohn_sham.prepare(
                    from_xyz_file(os.path.join(here, "molecules", "DHA.xyz")),
                    "B3LYP", grid_level=3,
                )
                pk = pack_pallas_inputs(dha.sys.ao, dha.sys.weights,
                                        dha.sys.ao_grad, n_grad=True)
                dmd = initial_guess(dha.sys)
                nd = dha.sys.ao.shape[1]

                def _dha_call(functional, dmx, *_):
                    return xc_step_pallas_packed(functional, dmx, pk[0],
                                                 pk[1], pk[2], nd)

                def _dha_call_split(functional, dmx, *_):
                    # the 3-pass bf16 phi_D variant the mixed schedule
                    # runs in its far-from-convergence phase
                    return xc_step_pallas_packed(functional, dmx, pk[0],
                                                 pk[1], pk[2], nd,
                                                 phi_split=True)

                # warm-up discard: the first timed case in a fresh
                # process measures artificially slow (verify skill)
                _time_xc(_dha_call, 3, functional=dha.functional,
                         dmx=dmd, args=(None,))
                dha_ms = _time_xc(_dha_call, 20, functional=dha.functional,
                                  dmx=dmd, args=(None,))
                dha_ms_split = _time_xc(_dha_call_split, 20,
                                        functional=dha.functional,
                                        dmx=dmd, args=(None,))
                npad_d = (nd + 127) // 128 * 128
                mb_d = 4 * npad_d * pk[0].shape[1] * 4 / 1e6
                extra["dha_shape"] = {
                    "nao": nd,
                    "xc_ms_per_call_packed": round(dha_ms, 3),
                    "xc_bw_gbs": round(mb_d / dha_ms, 1),
                    "xc_bw_frac_819": round(mb_d / dha_ms / 819.0, 3),
                    "xc_ms_per_call_phi_split": round(dha_ms_split, 3),
                    "xc_bw_frac_819_phi_split": round(
                        mb_d / dha_ms_split / 819.0, 3),
                }
            except Exception as e:  # keep the headline bench robust
                extra["dha_shape"] = {"error": f"{type(e).__name__}: {e}"}

    # speedup vs the first recorded round (the reference publishes no
    # numbers, BASELINE.md): env override, else BENCH_r01.json when it
    # measured the same config, else 1.0 (this run IS the baseline)
    vs_baseline = 1.0
    if BASELINE_S:
        vs_baseline = float(BASELINE_S) / scf_s
    else:
        r1 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_r01.json")
        try:
            with open(r1) as f:
                p = json.load(f).get("parsed", {})
            if p.get("metric") == (f"{MOLECULE.lower()}_"
                                   f"{setup.functional.name.lower()}"
                                   "_scf_wallclock") and p.get("value"):
                vs_baseline = float(p["value"]) / scf_s
        except (OSError, ValueError):
            pass

    extra["total_s"] = round(time.time() - t_all, 2)
    result = {
        "metric": f"{MOLECULE.lower()}_{setup.functional.name.lower()}_scf_wallclock",
        "value": round(scf_s, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 4),
        "extra": extra,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
