from quantum_compute_dft_tpu.runtime.ffi import (  # noqa: F401
    HostSolverWrapper,
    build_library,
    library_path,
)
from quantum_compute_dft_tpu.runtime.native_scf import (  # noqa: F401
    run_native_scf,
)
