"""Full multi-chip SCF iteration: grid-sharded XC + sharded J/K +
DIIS + generalized eigensolve, compiled as one jitted SPMD program.

This is the framework's "training step over a mesh": the quadrature grid
(sequence axis) is sharded for XC, and the Fock build shards either the
in-core ERI over its leading AO index or -- in density-fitting mode, the
only mode that exists at the 117-atom north-star scale -- the (nao, nao,
naux) j3c tensor over the AUX axis (parallel/sharded.py).  D, Hcore, S, X
and all (nao, nao) matrices are replicated; per-shard contributions meet
in psum/all_gather over ICI (SURVEY.md section 2.4).

The density rebuild reuses scf.driver._density, so the multi-chip path
shares the single-chip TPU numerics recovery (matrix-sign purification
against XLA's f32-quality f64 eigh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantum_compute_dft_tpu.parallel.mesh import GRID_AXIS, pad_to_multiple, shard_grid_arrays
from quantum_compute_dft_tpu.parallel.sharded import (
    sharded_df_builders,
    sharded_fock_builders,
    sharded_xc_step,
)
from quantum_compute_dft_tpu.scf.diis import diis_init, diis_update
from quantum_compute_dft_tpu.scf.driver import SCFSystem, _density
from quantum_compute_dft_tpu.xc.functionals import Functional


def make_sharded_scf(mesh: Mesh, sys: SCFSystem, functional: Functional):
    """-> (step, dm0, diis0) where step(dm, diis) runs one SPMD SCF cycle.

    Works in both ERI modes: in-core (sys.eri sharded over AO rows) and
    density-fitting (sys.df_j3c sharded over the aux axis) -- the latter is
    required for large systems where sys.eri is None (nao > ~110)."""
    n_dev = mesh.devices.size
    nao = sys.hcore.shape[0]
    c_hf = functional.hyb_coeff

    ao_s, w_s, g_s = shard_grid_arrays(mesh, sys.ao, sys.weights, sys.ao_grad)
    rep = NamedSharding(mesh, P())
    hcore = jax.device_put(sys.hcore, rep)
    s_mat = jax.device_put(sys.s, rep)
    x_mat = jax.device_put(sys.x, rep)

    if sys.eri is not None:
        eri_pad = pad_to_multiple(jnp.asarray(sys.eri), n_dev, 0)
        eri_s = jax.device_put(
            eri_pad, NamedSharding(mesh, P(GRID_AXIS, None, None, None))
        )
        j_fn, k_fn = sharded_fock_builders(mesh)

        def build_jk(dm):
            j = j_fn(eri_s, dm)[:nao]
            k = k_fn(eri_s, dm)[:nao] if c_hf != 0.0 else None
            return j, k

    elif sys.df_j3c is not None:
        build_jk = sharded_df_builders(
            mesh, sys.df_j3c, sys.df_v2c, build_k=c_hf != 0.0
        )
    else:
        raise ValueError(
            "make_sharded_scf needs either in-core ERIs (sys.eri) or the DF "
            "tensors (sys.df_j3c/df_v2c); prepare(..., density_fit=True) "
            "keeps the latter"
        )

    xc_fn = sharded_xc_step(mesh, functional)
    nocc = sys.nocc
    nopen = sys.nopen
    e_nuc = sys.e_nuc

    @jax.jit
    def step(dm, diis):
        j, k = build_jk(dm)
        e_xc, vxc = xc_fn(dm, ao_s, w_s, g_s)
        if k is not None:
            f = hcore + j + vxc - 0.5 * c_hf * k
        else:
            f = hcore + j + vxc
        diis, f = diis_update(diis, f, dm, s_mat, x_mat)
        dm_new = _density(x_mat, f, nocc, nopen)
        e_one = jnp.sum(dm_new * hcore)
        e_coul = 0.5 * jnp.sum(dm_new * j)
        e_ex = -0.25 * c_hf * jnp.sum(dm_new * k) if k is not None else 0.0
        e_tot = e_one + e_coul + e_xc + e_ex + e_nuc
        return dm_new, diis, e_tot

    # initial guess, replicated: SAD when the system carries it (matching
    # scf.driver.initial_guess), else Hcore (ref dft.py:181-182)
    if sys.dm_sad is not None:
        dm0 = jax.device_put(sys.dm_sad, rep)
    else:
        dm0 = _density(x_mat, hcore, nocc, nopen)
    return step, dm0, diis_init(nao)
