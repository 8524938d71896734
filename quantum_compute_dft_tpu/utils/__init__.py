from quantum_compute_dft_tpu.utils.profiling import PhaseTimer, trace  # noqa: F401
