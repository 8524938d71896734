"""Native C++ host engine tests: ABI, XC parity with the JAX engine, J."""

import shutil

import numpy as np
import pytest

from quantum_compute_dft_tpu import kohn_sham
from quantum_compute_dft_tpu.engine.coulomb import coulomb_full
from quantum_compute_dft_tpu.engine.xc_engine import xc_step
from quantum_compute_dft_tpu.mol import from_atoms
from quantum_compute_dft_tpu.scf.driver import initial_guess

gxx = shutil.which("g++")
pytestmark = pytest.mark.skipif(gxx is None, reason="no g++ toolchain")

H2O = [
    ("O", (0.0, 0.0, 0.127)),
    ("H", (0.0, 0.758, -0.509)),
    ("H", (0.0, -0.758, -0.509)),
]


@pytest.fixture(scope="module")
def wrapper_cls():
    from quantum_compute_dft_tpu.runtime import HostSolverWrapper, build_library

    build_library()
    return HostSolverWrapper


@pytest.mark.parametrize("functional", ["LDA", "GGA", "B3LYP"])
def test_native_xc_matches_jax_engine(wrapper_cls, functional):
    setup = kohn_sham.prepare(from_atoms(H2O), functional, grid_level=1)
    dm = np.ascontiguousarray(np.asarray(initial_guess(setup.sys)))
    e_ref, v_ref = xc_step(
        setup.functional, dm, setup.sys.ao, setup.sys.weights, setup.sys.ao_grad
    )
    w = wrapper_cls(functional)
    vxc = np.zeros_like(dm)
    ao = np.ascontiguousarray(np.asarray(setup.sys.ao))
    wts = np.ascontiguousarray(np.asarray(setup.sys.weights))
    g = (
        None
        if setup.sys.ao_grad is None
        else np.ascontiguousarray(np.asarray(setup.sys.ao_grad))
    )
    exc = w.compute_xc(dm, ao, wts, vxc, g)
    assert abs(exc - float(e_ref)) < 1e-10
    assert np.abs(vxc - np.asarray(v_ref)).max() < 1e-9


def test_native_coulomb_matches(wrapper_cls):
    setup = kohn_sham.prepare(from_atoms(H2O), "LDA", grid_level=1)
    dm = np.ascontiguousarray(np.asarray(initial_guess(setup.sys)))
    n = dm.shape[0]
    eri2 = np.ascontiguousarray(np.asarray(setup.sys.eri).reshape(n * n, n * n))
    out = np.zeros((n, n))
    w = wrapper_cls("LDA")
    w.compute_coulomb(eri2, dm, out)
    j_ref = coulomb_full(setup.sys.eri, dm)
    assert np.abs(out - np.asarray(j_ref)).max() < 1e-12


def test_invalid_solver_type(wrapper_cls):
    with pytest.raises(KeyError):
        wrapper_cls("NOPE")
