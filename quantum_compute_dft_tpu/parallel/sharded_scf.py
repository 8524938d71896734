"""Full multi-chip SCF iteration: grid-sharded XC + AO-row-sharded J/K +
DIIS + generalized eigensolve, compiled as one jitted SPMD program.

This is the framework's "training step over a mesh": the quadrature grid
(sequence axis) and the ERI leading AO index (tensor axis) are sharded;
D, Hcore, S, X and all (nao, nao) matrices are replicated; per-shard
contributions meet in psum/all_gather over ICI (SURVEY.md section 2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantum_compute_dft_tpu.parallel.mesh import GRID_AXIS, pad_to_multiple, shard_grid_arrays
from quantum_compute_dft_tpu.parallel.sharded import sharded_fock_builders, sharded_xc_step
from quantum_compute_dft_tpu.scf.diis import diis_init, diis_update
from quantum_compute_dft_tpu.scf.driver import SCFSystem, s_inv_sqrt
from quantum_compute_dft_tpu.xc.functionals import Functional


def make_sharded_scf(mesh: Mesh, sys: SCFSystem, functional: Functional):
    """-> (step, dm0, diis0) where step(dm, diis) runs one SPMD SCF cycle."""
    n_dev = mesh.devices.size
    nao = sys.hcore.shape[0]

    ao_s, w_s, g_s = shard_grid_arrays(mesh, sys.ao, sys.weights, sys.ao_grad)
    eri_pad = pad_to_multiple(jnp.asarray(sys.eri), n_dev, 0)
    eri_s = jax.device_put(
        eri_pad, NamedSharding(mesh, P(GRID_AXIS, None, None, None))
    )
    rep = NamedSharding(mesh, P())
    hcore = jax.device_put(sys.hcore, rep)
    s_mat = jax.device_put(sys.s, rep)
    x_mat = jax.device_put(sys.x, rep)

    xc_fn = sharded_xc_step(mesh, functional)
    j_fn, k_fn = sharded_fock_builders(mesh)
    c_hf = functional.hyb_coeff
    nocc = sys.nocc
    e_nuc = sys.e_nuc

    @jax.jit
    def step(dm, diis):
        j = j_fn(eri_s, dm)[:nao]
        e_xc, vxc = xc_fn(dm, ao_s, w_s, g_s)
        if c_hf != 0.0:
            k = k_fn(eri_s, dm)[:nao]
            f = hcore + j + vxc - 0.5 * c_hf * k
        else:
            k = None
            f = hcore + j + vxc
        diis, f = diis_update(diis, f, dm, s_mat, x_mat)
        fp = x_mat.T @ f @ x_mat
        _, cp = jnp.linalg.eigh(fp)
        c = x_mat @ cp
        dm_new = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        e_one = jnp.sum(dm_new * hcore)
        e_coul = 0.5 * jnp.sum(dm_new * j)
        e_ex = -0.25 * c_hf * jnp.sum(dm_new * k) if k is not None else 0.0
        e_tot = e_one + e_coul + e_xc + e_ex + e_nuc
        return dm_new, diis, e_tot

    # Hcore guess, replicated
    fp = x_mat.T @ hcore @ x_mat
    _, cp = jnp.linalg.eigh(fp)
    c = x_mat @ cp
    dm0 = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    return step, dm0, diis_init(nao)
