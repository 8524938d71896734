"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest).

Exercises the grid-sharded psum path and the AO-row-sharded J/K builders
against the single-device reference results (SURVEY.md section 4 item d).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantum_compute_dft_tpu import kohn_sham
from quantum_compute_dft_tpu.engine.coulomb import coulomb_full, exchange_full
from quantum_compute_dft_tpu.engine.xc_engine import xc_step
from quantum_compute_dft_tpu.mol import from_atoms
from quantum_compute_dft_tpu.parallel import (
    grid_mesh,
    pad_to_multiple,
    shard_grid_arrays,
    sharded_fock_builders,
    sharded_xc_step,
)
from quantum_compute_dft_tpu.scf.driver import initial_guess

H2O = [
    ("O", (0.0, 0.0, 0.127)),
    ("H", (0.0, 0.758, -0.509)),
    ("H", (0.0, -0.758, -0.509)),
]


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mol = from_atoms(H2O)
    return kohn_sham.prepare(mol, "B3LYP", grid_level=1)


def test_sharded_xc_matches_single_device(setup):
    mesh = grid_mesh()
    dm = initial_guess(setup.sys)
    e_ref, v_ref = xc_step(
        setup.functional, dm, setup.sys.ao, setup.sys.weights, setup.sys.ao_grad
    )
    ao_s, w_s, g_s = shard_grid_arrays(
        mesh, setup.sys.ao, setup.sys.weights, setup.sys.ao_grad
    )
    fn = sharded_xc_step(mesh, setup.functional)
    e_sh, v_sh = fn(dm, ao_s, w_s, g_s)
    assert abs(float(e_sh) - float(e_ref)) < 1e-11
    assert float(jnp.abs(v_sh - v_ref).max()) < 1e-11


def test_sharded_jk_match_single_device(setup):
    mesh = grid_mesh()
    dm = initial_guess(setup.sys)
    nao = dm.shape[0]
    eri = np.asarray(setup.sys.eri)
    eri_pad = pad_to_multiple(eri, 8, 0)
    from jax.sharding import NamedSharding, PartitionSpec as P

    eri_s = jax.device_put(eri_pad, NamedSharding(mesh, P("grid", None, None, None)))
    jfn, kfn = sharded_fock_builders(mesh)
    j_sh = jfn(eri_s, dm)[:nao]
    k_sh = kfn(eri_s, dm)[:nao]
    j_ref = coulomb_full(setup.sys.eri, dm)
    k_ref = exchange_full(setup.sys.eri, dm)
    assert float(jnp.abs(j_sh - j_ref).max()) < 1e-11
    assert float(jnp.abs(k_sh - k_ref).max()) < 1e-11


def test_lda_sharded_without_gradients(setup):
    mol = from_atoms(H2O)
    s_lda = kohn_sham.prepare(mol, "LDA", grid_level=1)
    mesh = grid_mesh()
    dm = initial_guess(s_lda.sys)
    e_ref, v_ref = xc_step(s_lda.functional, dm, s_lda.sys.ao, s_lda.sys.weights, None)
    ao_s, w_s, _ = shard_grid_arrays(mesh, s_lda.sys.ao, s_lda.sys.weights)
    fn = sharded_xc_step(mesh, s_lda.functional)
    e_sh, v_sh = fn(dm, ao_s, w_s, None)
    assert abs(float(e_sh) - float(e_ref)) < 1e-11
    assert float(jnp.abs(v_sh - v_ref).max()) < 1e-11
