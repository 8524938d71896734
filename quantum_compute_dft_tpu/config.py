"""Global numerical configuration.

The reference engine is float64 throughout (src/dft_solver.cu uses double
everywhere); 1e-6 Eh SCF parity demands f64 accumulation, so x64 is enabled
at import.  TPU executes f64 via software emulation; the performance path
(engine/pallas_xc.py) offers f32 compute with f64 accumulation instead.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Default dtype for the parity path.
DTYPE = "float64"

# Floors matching the reference guards (src/dft_solver.cu:12-13).
RHO_EPS = 1e-12
MIN_GRAD = 1e-20


def default_backend() -> str:
    return os.environ.get("JAX_PLATFORMS", "").split(",")[0] or jax.default_backend()
