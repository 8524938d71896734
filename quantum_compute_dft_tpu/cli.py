"""Command-line interface.

Mirrors the reference CLI surface ``python dft.py {LDA,GGA,B3LYP} <Molecule>``
(ref dft.py:101-116) with the same console UX -- banner, system info,
per-cycle table (epoch / total energy / dE / d-density / HF exchange,
ref dft.py:186-189,241), converged summary with the energy decomposition
(ref dft.py:249-262) and per-iteration XC kernel statistics (ref
dft.py:246-247,260-261) -- plus flags the reference hard-codes: grid level,
convergence thresholds, max cycles, grid-file input (the init_grid path,
ref grid.py:6-20), and an optional PySCF validation pass (ref
dft.py:272-297) that activates only when PySCF is importable.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="quantum_compute_dft_tpu",
        description="TPU-native DFT (LDA/GGA/B3LYP) with a JAX/XLA/Pallas engine.",
    )
    p.add_argument(
        "functional",
        choices=["LDA", "GGA", "B3LYP", "HF", "PBE"],
        help="Functional type (GGA == PBE; HF is a bonus over the reference)",
    )
    p.add_argument("xyzfile", help="Molecule name (e.g. H2O) or path to .xyz")
    p.add_argument(
        "--molecules-dir",
        default=os.environ.get("DFT_MOLECULES_DIR", "./molecules"),
        help="Directory with <name>.xyz geometries (default ./molecules)",
    )
    p.add_argument("--grid-level", type=int, default=3, help="Becke grid level 0-9")
    p.add_argument("--no-prune", action="store_true", help="Disable grid pruning")
    p.add_argument(
        "--grid-file",
        default=None,
        help="6-column grid file (atom_idx x y z w w) overriding the native grid",
    )
    p.add_argument("--max-cycle", type=int, default=200)
    p.add_argument("--conv-tol-e", type=float, default=1e-8)
    p.add_argument("--conv-tol-d", type=float, default=1e-6)
    p.add_argument("--charge", type=int, default=0)
    p.add_argument(
        "--jit-loop",
        action="store_true",
        help="Run the whole SCF as one on-device lax.while_loop (no per-cycle table)",
    )
    p.add_argument(
        "--staged",
        action="store_true",
        help="Dispatch each SCF phase as its own jitted call (fast TPU compiles); "
        "auto-enabled on non-CPU backends",
    )
    p.add_argument(
        "--xc-impl",
        choices=["f64", "pallas", "mixed", "fast"],
        default="fast",
        help="SCF numerics schedule: 'fast' (default: whole SCF on the "
        "f32 engines to the full convergence rule, final energy "
        "re-evaluated in f64 -- variational O(eps^2) error, measured "
        "<4e-8 Eh vs 'f64'; coerced to 'f64' on CPU), 'mixed' (f32 "
        "early phase + f64-anchored delta refinement), 'f64' (pure "
        "parity path), or 'pallas' (f32 incl. the reported energy)",
    )
    p.add_argument(
        "--density-fit",
        choices=["auto", "on", "off"],
        default="auto",
        help="J/K via density-fitted ERIs (auto: on above nao ~ 110)",
    )
    p.add_argument(
        "--df-aux",
        choices=["parity", "tight", "fast"],
        default="parity",
        help="DF factorization: 'parity' = pivoted-Cholesky ERI vectors "
        "(guaranteed elementwise error, ~1e-6 Eh SCF parity); 'tight'/"
        "'fast' = even-tempered RI auxiliary sets (cheaper build, "
        "~1e-5/2e-5 Eh)",
    )
    p.add_argument(
        "--checkpoint",
        default=None,
        help="Path to save the converged density (.npz); if the file exists, "
        "resume from it",
    )
    p.add_argument(
        "--smear-kt", type=float, default=0.0,
        help="FON-RKS Fermi smearing at this electronic temperature (Eh); "
        "0 = integer occupations.  Use for near-degenerate frontier "
        "manifolds (e.g. CuO)",
    )
    p.add_argument(
        "--no-auto-anneal",
        action="store_true",
        help="Disable the automatic FON-RKS annealing-ladder retry when "
        "the integer-occupation SCF fails to converge (near-degenerate "
        "systems like CuO, where the reference crashes outright)",
    )
    p.add_argument(
        "--validate",
        nargs="?",
        const="auto",
        default=None,
        choices=["auto", "pyscf", "native"],
        help="End-of-run oracle re-solve (ref dft.py:272-297). 'pyscf' "
        "re-solves with PySCF when installed; 'native' re-solves with the "
        "independently written C++ host engine (runtime/, in-core path); "
        "bare --validate ('auto') tries PySCF and falls back to native",
    )
    return p


def resolve_molecule(args) -> str:
    name = args.xyzfile if args.xyzfile.lower().endswith(".xyz") else args.xyzfile + ".xyz"
    if os.path.exists(name):
        return name
    path = os.path.join(args.molecules_dir, name)
    if not os.path.exists(path):
        print(f"Error: {path} not found.")
        sys.exit(1)
    return path


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    atom_path = resolve_molecule(args)
    mol_name = os.path.basename(atom_path)

    print(f"=== TPU DFT | functional: {args.functional} | molecule: {mol_name} ===")
    print("Building host data (basis, integrals, grid)...")

    from quantum_compute_dft_tpu.mol import from_xyz_file
    from quantum_compute_dft_tpu import kohn_sham
    from quantum_compute_dft_tpu.engine.xc_engine import xc_step
    from quantum_compute_dft_tpu.scf.driver import (
        scf_host,
        scf_host_staged,
        scf_jit,
    )
    from quantum_compute_dft_tpu.scf.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    import jax as _jax

    mol = from_xyz_file(atom_path, charge=args.charge)
    grid = None
    if args.grid_file:
        from quantum_compute_dft_tpu.grids import load_grid_file

        grid = load_grid_file(args.grid_file)

    setup = kohn_sham.prepare(
        mol,
        args.functional,
        grid_level=args.grid_level,
        grid=grid,
        prune=not args.no_prune,
        density_fit={"auto": None, "on": True, "off": False}[args.density_fit],
        df_aux=args.df_aux,
    )
    print(
        f"System info: NAO={setup.nao}  grid points={setup.ngrid}  "
        f"occupied={setup.nocc}  (build {setup.build_time:.2f}s)"
    )

    dm0 = None
    if args.checkpoint and os.path.exists(args.checkpoint):
        ck = load_checkpoint(args.checkpoint)
        # the stored metadata must match, not just nao: a checkpoint from a
        # different molecule/functional with the same nao is a wrong guess
        if ck["dm"].shape[0] != setup.nao:
            print(f"Checkpoint {args.checkpoint} has nao={ck['dm'].shape[0]} "
                  f"!= {setup.nao}; starting from the Hcore guess.")
        elif ck["molecule"] and ck["molecule"] != mol_name:
            print(f"Checkpoint {args.checkpoint} is for molecule "
                  f"{ck['molecule']!r}, not {mol_name!r}; skipping resume.")
        elif ck["functional"] and ck["functional"] != setup.functional.name:
            print(f"Checkpoint {args.checkpoint} is for functional "
                  f"{ck['functional']}, not {setup.functional.name}; "
                  "skipping resume.")
        else:
            dm0 = ck["dm"]
            print(f"Resuming from checkpoint {args.checkpoint} "
                  f"(cycle {ck['cycle']}, E={ck['e_tot']:.8f})")

    t_start = time.time()
    if args.jit_loop:
        dm, eb, n_iter, done = scf_jit(setup.sys, setup.functional,
                                       max_cycle=args.max_cycle)
        e_tot = float(eb.e_tot)
        converged = bool(done)
        n_iter = int(n_iter)
    else:
        print("\nSCF started")
        print("-" * 80)
        print(f"{'epoch':>5} {'total energy':>18} {'dE':>14} {'d-density':>14} {'HF_Ex':>12}")
        print("-" * 80)

        def cb(cycle, eb, de, dnorm):
            print(
                f"{cycle + 1:5d} {float(eb.e_tot):18.8f} {de:14.6e} "
                f"{dnorm:14.6e} {float(eb.e_ex_hf):12.6f}"
            )

        staged = args.staged or _jax.default_backend() != "cpu"
        kwargs = dict(
            callback=cb,
            max_cycle=args.max_cycle,
            conv_tol_e=args.conv_tol_e,
            conv_tol_d=args.conv_tol_d,
            dm0=dm0,
            smear_kt=args.smear_kt,
        )
        if staged:
            if args.checkpoint:
                # mid-run periodic saves (atomic): a crash at cycle 200
                # of a 20-minute run resumes from the last save instead
                # of the Hcore guess
                from quantum_compute_dft_tpu.scf.checkpoint import (
                    periodic_saver,
                )

                kwargs["checkpoint_cb"] = periodic_saver(
                    args.checkpoint, setup.functional.name, mol_name)
            res = scf_host_staged(setup.sys, setup.functional,
                                  xc_impl=args.xc_impl, **kwargs)
        else:
            res = scf_host(setup.sys, setup.functional, **kwargs)
        if (not res.converged and args.smear_kt == 0.0
                and not args.no_auto_anneal):
            # integer occupations have no reachable fixed point for some
            # near-degenerate systems (CuO d-shell doublet -- the
            # reference crashes on these, ref grid.py:46 spin=0 build);
            # retry with the FON-RKS annealing ladder, warm-started hot.
            from quantum_compute_dft_tpu.scf.driver import scf_host_annealed

            print("-" * 80)
            print("SCF did not converge with integer occupations; "
                  "retrying with the FON-RKS annealing ladder "
                  "(Fermi smearing, kT 0.5 annealed toward 0.1; the "
                  "coldest converged rung is reported)")
            kwargs.pop("smear_kt")
            kwargs.pop("checkpoint_cb", None)  # staged-loop-only arg
            # the ladder always runs on the plain host loop with the
            # ADIIS->CDIIS mixer: the staged runner's CDIIS-only stack
            # charge-sloshes on exactly the systems the ladder is for
            # (CuO/L3: staged kT=0.5 stalls where host/ADIIS converges)
            res = scf_host_annealed(setup.sys, setup.functional,
                                    mixer="adiis+cdiis", **kwargs)
        eb, e_tot, converged, n_iter, dm = (
            res.energy, res.e_tot, res.converged, res.n_iter, res.dm,
        )
    total_time = time.time() - t_start

    if args.checkpoint:
        save_checkpoint(args.checkpoint, dm, e_tot, n_iter,
                        setup.functional.name, mol_name)

    # standalone XC kernel statistic (the reference's "XC(Exc+Vxc) Time",
    # ref dft.py:205-208): time the XC step of the engine that actually ran
    # the SCF (--xc-impl), not unconditionally the f64 path.
    import jax

    use_pallas = args.xc_impl in ("pallas", "mixed", "fast") and \
        jax.default_backend() not in ("cpu",)
    xc_fn = None
    if setup.sys.ao is None:
        # lean-AO mode (no persistent f64 planes): time the per-cycle
        # Pallas path through the driver's packed-plane cache -- unless
        # the delta64 endgame already dropped it (drop_packed)
        from quantum_compute_dft_tpu.scf.driver import (
            _PALLAS_PACK_CACHE,
            _pallas_xc,
        )

        if setup.sys in _PALLAS_PACK_CACHE:
            xc_fn = lambda f, d, ao, w, g: _pallas_xc(setup.sys, f, d)  # noqa: E731
            xc_label = "pallas f32 (lean)"
        else:
            xc_label = "lean (packed planes dropped; not timed)"
    elif use_pallas:
        from quantum_compute_dft_tpu.engine.pallas_xc import xc_step_pallas

        xc_fn = xc_step_pallas
        xc_label = "pallas f32"
    else:
        xc_fn = xc_step
        xc_label = "f64"
    xc_ms = float("nan")
    if xc_fn is not None:
        exc, vxc = xc_fn(setup.functional, dm, setup.sys.ao,
                         setup.sys.weights, setup.sys.ao_grad)
        jax.block_until_ready(vxc)
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            exc, vxc = xc_fn(setup.functional, dm, setup.sys.ao,
                             setup.sys.weights, setup.sys.ao_grad)
        jax.block_until_ready(vxc)
        xc_ms = (time.time() - t0) / reps * 1000.0

    print("-" * 80)
    if converged:
        print(f"Converged in {n_iter} cycles")
    else:
        print("SCF did not converge")
    print(f"Total energy : {e_tot:.8f} Ha")
    print(f"  E_one      : {float(eb.e_one):.8f} Ha")
    print(f"  E_coul     : {float(eb.e_coul):.8f} Ha")
    print(f"  E_nuc      : {setup.sys.e_nuc:.8f} Ha")
    print(f"  E_xc       : {float(eb.e_xc):.8f} Ha")
    if setup.functional.hyb_coeff:
        print(f"  E_ex_hf    : {float(eb.e_ex_hf):.8f} Ha")
    print(f"SCF time     : {total_time:.4f} s")
    print("-" * 80)
    print("Kernel statistics (avg per call):")
    print(f"  XC(Exc+Vxc): {xc_ms:.4f} ms  [{xc_label} engine]")
    print("-" * 80)

    if args.validate:
        _validate(mol, args.functional, e_tot, atom_path, args.validate,
                  setup, args.grid_level)
    return 0 if converged else 2


def _validate(mol, functional, e_tot, atom_path, mode="auto",
              setup=None, grid_level=3):
    """End-of-run oracle comparison (ref dft.py:272-297): PySCF when
    available, else the independently written C++ host engine."""
    if mode in ("auto", "pyscf"):
        try:
            from pyscf import gto, dft as pyscf_dft  # noqa: F401
        except ImportError:
            if mode == "pyscf":
                print("PySCF not available in this environment; "
                      "skipping validation.")
                return
            print("PySCF not available; validating with the native C++ "
                  "engine instead (--validate native).")
            mode = "native"
    if mode == "native":
        _validate_native(mol, functional, e_tot, setup, grid_level)
        return
    from pyscf import gto, dft as pyscf_dft
    xc = {"LDA": "slater,vwn5", "GGA": "PBE,PBE", "PBE": "PBE,PBE",
          "B3LYP": "b3lyp", "HF": "hf"}[functional]
    m = gto.Mole()
    # reuse the native parser (mol/xyz.py) rather than re-reading with a
    # hard-coded 2-line header strip: the native parser also accepts
    # header-less xyz files, and stripping those would silently drop atoms
    from quantum_compute_dft_tpu.mol.xyz import parse_xyz_text

    with open(atom_path) as f:
        atoms = parse_xyz_text(f.read())
    m.atom = [(sym, xyz) for sym, xyz in atoms]
    m.charge = mol.charge
    m.basis = "sto-3g"
    m.verbose = 0
    m.build()
    mf = pyscf_dft.RKS(m)
    mf.xc = xc
    t0 = time.time()
    mf.kernel()
    print(f"PySCF ({xc}) energy : {mf.e_tot:.8f} Ha")
    print(f"difference          : {abs(mf.e_tot - e_tot):.2e} Ha")
    print(f"PySCF time          : {time.time() - t0:.4f} s")


def _validate_native(mol, functional, e_tot, setup, grid_level):
    """Re-solve with the independently written C++ host engine
    (runtime/native_scf.py: C-ABI XC/J + scipy eigh + numpy CDIIS, the
    reference driver's exact shape, ref dft.py:199-266) and print the
    energy difference -- the in-environment stand-in for the reference's
    PySCF oracle pass."""
    import numpy as np

    if functional.upper() not in ("LDA", "GGA", "PBE", "B3LYP"):
        print(f"native validation supports LDA/GGA/B3LYP only "
              f"(got {functional}); skipping.")
        return
    try:
        from quantum_compute_dft_tpu.runtime import build_library, run_native_scf

        build_library()
    except Exception as e:  # no g++ toolchain, build failure
        print(f"native engine unavailable ({type(e).__name__}: {e}); "
              "skipping validation.")
        return
    sys_ = None if setup is None else setup.sys
    if sys_ is None or sys_.eri is None or sys_.ao is None:
        # the DF/lean production path dropped the in-core operands the C
        # engine needs; rebuild them (disk-cached) when the molecule is
        # small enough for the (nao^4) ERI tensor
        nao = 0 if setup is None else setup.nao
        if setup is not None and nao > 130:
            print(f"native validation needs the in-core ERI path "
                  f"(nao={nao} > 130); skipping.")
            return
        from quantum_compute_dft_tpu import kohn_sham

        setup = kohn_sham.prepare(mol, functional, grid_level=grid_level,
                                  density_fit=False)
        sys_ = setup.sys
    t0 = time.time()
    e_nat, _dm, n_iter, conv = run_native_scf(
        functional,
        np.asarray(sys_.hcore), np.asarray(sys_.s), np.asarray(sys_.eri),
        np.asarray(sys_.ao), np.asarray(sys_.weights),
        None if sys_.ao_grad is None else np.asarray(sys_.ao_grad),
        sys_.e_nuc, sys_.nocc,
    )
    tag = "" if conv else " (UNCONVERGED)"
    print(f"native C++ ({functional}) energy : {e_nat:.8f} Ha"
          f"  [{n_iter} cycles{tag}]")
    print(f"difference                : {abs(e_nat - e_tot):.2e} Ha")
    print(f"native engine time        : {time.time() - t0:.4f} s")


if __name__ == "__main__":
    sys.exit(main())
