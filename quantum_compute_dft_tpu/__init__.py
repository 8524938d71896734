"""TPU-native restricted Kohn-Sham DFT framework (JAX / XLA / Pallas).

A from-scratch reimplementation of the capability set of the CUDA reference
``knight46/Quantum_compute_DFT`` (see /root/repo/SURVEY.md): restricted
Kohn-Sham SCF over Gaussian STO-3G basis sets with LDA (Slater+VWN5),
GGA (PBE) and hybrid B3LYP functionals.  Everything the reference delegated
to PySCF (molecule setup, one-/two-electron integrals, Becke grids, AO
evaluation) is implemented natively here, and the per-iteration hot path
(Coulomb J, XC energy + V_xc, exact-exchange K) runs as XLA GEMMs and Pallas
TPU kernels instead of hand-written CUDA.

Layout (cf. SURVEY.md section 7.1):
    mol/        XYZ parsing, elements, nuclear repulsion     (ref grid.py:42-67)
    basis/      STO-3G tables + STO-nG fit generator
    integrals/  McMurchie-Davidson S, T, V, ERI in JAX       (ref grid.py:61-65)
    grids/      Becke molecular quadrature grids             (ref grid.py:6-39)
    xc/         LDA/GGA functional library, autodiff potentials
                                                    (ref src/dft_solver.cu:61-283)
    engine/     AO evaluation, XC engine (jnp + Pallas), J/K (ref src/dft_solver.cu)
    scf/        jitted SCF driver, DIIS, generalized eigh    (ref dft.py:101-269)
    parallel/   device mesh, grid-sharded Exc/Vxc/J/K via shard_map + psum
    runtime/    native C++ host engine with the reference C ABI
                                                    (ref src/dft_solver.h:66-88)
"""

from quantum_compute_dft_tpu import config as _config  # noqa: F401  (enables x64)

__version__ = "0.1.0"
