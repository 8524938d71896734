from quantum_compute_dft_tpu.scf.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from quantum_compute_dft_tpu.scf.diis import DIISState, diis_init, diis_update  # noqa: F401
from quantum_compute_dft_tpu.scf.driver import (  # noqa: F401
    SCFResult,
    SCFSystem,
    initial_guess,
    make_system,
    s_inv_sqrt,
    scf_host,
    scf_host_staged,
    scf_iteration,
    scf_iteration_staged,
    scf_jit,
)
