from quantum_compute_dft_tpu.integrals.boys import boys  # noqa: F401
from quantum_compute_dft_tpu.integrals.one_electron import one_electron  # noqa: F401
from quantum_compute_dft_tpu.integrals.two_electron import eri_full, eri_packed  # noqa: F401
