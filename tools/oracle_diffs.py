"""Generate docs/oracle_diffs.md: measured native-C++ vs JAX SCF diffs.

The independent C++ engine (runtime/dft_host.cpp: dual-number forward-AD
functionals, scipy-eigh/numpy-CDIIS reference driver) is this offline
environment's substitute for the reference's PySCF oracle pass (ref
dft.py:272-297).  This tool runs the stratified cross-validation matrix
-- {light, d-shell} x {in-core, DF} x {LDA, GGA, B3LYP} -- and records
the measured stationary-energy differences; the same comparisons are
asserted in tests/test_runtime.py.

Run (CPU): PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/oracle_diffs.py
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

OUT = os.path.join(HERE, "docs", "oracle_diffs.md")

ROWS = [
    # (molecule, functional, density_fit-on-JAX-side, class)
    ("H2O", "LDA", False, "light, in-core"),
    ("H2O", "GGA", False, "light, in-core"),
    ("H2O", "B3LYP", False, "light, in-core"),
    ("SeO3", "LDA", False, "d-shell (Se 3d), in-core"),
    ("SeO3", "B3LYP", False, "d-shell (Se 3d), in-core + hybrid K"),
    ("HBr", "GGA", False, "d-shell (Br 3d), in-core"),
    ("H2Se", "B3LYP", False, "d-shell (Se 3d), in-core + hybrid K"),
    ("Benzene", "B3LYP", True, "light, JAX side Cholesky-DF"),
    ("H2SeO4", "B3LYP", True, "d-shell (Se 3d), JAX side Cholesky-DF"),
]


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from quantum_compute_dft_tpu.runtime import build_library

    build_library()
    import test_runtime as tr

    lines = [
        "# Independent C++ oracle: measured full-SCF diffs (round 4)",
        "",
        "Both engines solve the same in-core Hamiltonian from opposite",
        "implementations: the JAX/TPU stack (autodiff functionals, jitted",
        "SCF, sign-purified density) vs `runtime/dft_host.cpp` (dual-number",
        "forward-AD functionals, scipy `eigh`, numpy CDIIS -- the reference",
        "driver's shape, ref dft.py:199-266).  Each row reports",
        "|E_stat(native dm) - E_stat(JAX dm)| at the shared in-core",
        "Hamiltonian -- the variationally stationary comparison that",
        "removes per-loop stopping noise.  Grid level 1.  Asserted",
        "continuously in tests/test_runtime.py (slow tier).",
        "",
        "| Molecule | Functional | Path class | dE (Eh) |",
        "|---|---|---|---|",
    ]
    for name, fn, df, klass in ROWS:
        t0 = time.time()
        tol = 1e-6 if df else 1e-7
        diff = tr._native_vs_jax_scf(name, fn, tol=tol, density_fit=df)
        print(f"{name}/{fn} df={df}: dE={diff:.3e}  ({time.time()-t0:.0f}s)",
              flush=True)
        lines.append(f"| {name} | {fn} | {klass} | {diff:.2e} |")

    # CuO: odd-electron doublet -- no integer-occupation native SCF
    # exists (the reference crashes on it); referee at fixed density.
    import warnings

    import numpy as np

    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.engine.coulomb import coulomb_full
    from quantum_compute_dft_tpu.engine.xc_engine import xc_step
    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu.runtime import HostSolverWrapper
    from quantum_compute_dft_tpu.scf.driver import initial_guess

    lines += [
        "",
        "CuO (Cu 3d, odd-electron doublet -- integer-occupation SCF has no",
        "fixed point; both engines evaluated at the SAD density):",
        "",
        "| Functional | dE_xc (Eh) | max dV_xc | max dJ |",
        "|---|---|---|---|",
    ]
    mol = from_xyz_file(os.path.join(HERE, "molecules", "CuO.xyz"))
    for fn in ("LDA", "GGA", "B3LYP"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            setup = kohn_sham.prepare(mol, fn, grid_level=1,
                                      density_fit=False)
        dm = np.ascontiguousarray(np.asarray(initial_guess(setup.sys)))
        e_ref, v_ref = xc_step(setup.functional, dm, setup.sys.ao,
                               setup.sys.weights, setup.sys.ao_grad)
        w = HostSolverWrapper(fn)
        vxc = np.zeros_like(dm)
        gr = (None if setup.sys.ao_grad is None
              else np.ascontiguousarray(np.asarray(setup.sys.ao_grad)))
        exc = w.compute_xc(
            dm, np.ascontiguousarray(np.asarray(setup.sys.ao)),
            np.ascontiguousarray(np.asarray(setup.sys.weights)), vxc, gr)
        n = dm.shape[0]
        eri2 = np.ascontiguousarray(
            np.asarray(setup.sys.eri).reshape(n * n, n * n))
        out = np.zeros((n, n))
        w.compute_coulomb(eri2, dm, out)
        de = abs(exc - float(e_ref))
        dv = float(np.abs(vxc - np.asarray(v_ref)).max())
        dj = float(np.abs(out - np.asarray(coulomb_full(setup.sys.eri,
                                                        dm))).max())
        print(f"CuO/{fn}: dExc={de:.3e} dV={dv:.3e} dJ={dj:.3e}", flush=True)
        lines.append(f"| {fn} | {de:.2e} | {dv:.2e} | {dj:.2e} |")

    # DHA at production scale (round 5): the largest prior full-SCF
    # cross-check was nao=36 (benzene); nothing on the production
    # lean-AO path at nao>=100 had ever been compared against the
    # independent engine.  The C ABI XC entry point needs no SCF and no
    # (nao^4) ERI, so the fixed-density E_xc/V_xc comparison runs at
    # DHA shape (nao=152) against the JAX stack's STREAMED lean-AO
    # values -- the exact code path the production TPU runs execute.
    from quantum_compute_dft_tpu.engine.ao_eval import eval_planes_scan
    from quantum_compute_dft_tpu.engine.xc_engine import xc_step_onfly

    lines += [
        "",
        "DHA (C14H12O2, nao=152) at grid level 1 -- fixed-density",
        "E_xc/V_xc through the PRODUCTION lean-AO streamed path",
        "(engine.xc_engine.xc_step_onfly, the north-star code path)",
        "vs the C++ engine on explicitly evaluated planes:",
        "",
        "| Functional | ngrid | dE_xc (Eh) | max dV_xc |",
        "|---|---|---|---|",
    ]
    mol = from_xyz_file(os.path.join(HERE, "molecules", "DHA.xyz"))
    setup = kohn_sham.prepare(mol, "B3LYP", grid_level=1,
                              density_fit=True, lean_ao=True)
    assert setup.sys.ao is None, "lean-AO path not engaged"
    dm = np.ascontiguousarray(np.asarray(initial_guess(setup.sys)))
    coords, tables = setup.sys.ao_tables
    e_jax, v_jax = xc_step_onfly(setup.functional, dm, coords,
                                 setup.sys.weights, tables)
    import jax.numpy as jnp

    g = int(setup.sys.weights.shape[0])
    pad = (-g) % 8192
    crd_pad = jnp.pad(jnp.asarray(coords), ((0, pad), (0, 0)))
    ao, gr = eval_planes_scan(crd_pad, tables, True, 8192)
    ao_np = np.ascontiguousarray(np.asarray(ao)[:g])
    gr_np = np.ascontiguousarray(np.asarray(gr)[:, :g])
    w_np = np.ascontiguousarray(np.asarray(setup.sys.weights))
    wsol = HostSolverWrapper("B3LYP")
    vxc = np.zeros_like(dm)
    t0 = time.time()
    exc = wsol.compute_xc(dm, ao_np, w_np, vxc, gr_np)
    de = abs(exc - float(e_jax))
    dv = float(np.abs(vxc - np.asarray(v_jax)).max())
    print(f"DHA/B3LYP lean-AO: dExc={de:.3e} dV={dv:.3e} "
          f"({time.time()-t0:.0f}s native)", flush=True)
    lines.append(f"| B3LYP | {g} | {de:.2e} | {dv:.2e} |")

    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print("wrote", OUT)
    return 0


if __name__ == "__main__":
    sys.exit(main())
