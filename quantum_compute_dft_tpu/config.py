"""Global numerical configuration.

The reference engine is float64 throughout (src/dft_solver.cu uses double
everywhere); 1e-6 Eh SCF parity demands f64 accumulation, so x64 is enabled
at import.  TPU executes f64 via software emulation; the performance path
(engine/pallas_xc.py) offers f32 compute with f64 accumulation instead.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the axon remote compiler takes minutes for
# large f64 graphs (measured 328 s for one fused SCF iteration); caching
# makes every run after the first start in seconds.  DEFAULT-ON for
# TPU-bearing processes (a CLI run without it pays ~60 s of recompiles
# every invocation); disable with DFT_JAX_CACHE=0.  CPU-only processes
# skip it -- sharing one cache dir across heterogeneous machines triggers
# mismatched-feature AOT loads (SIGILL risk).
_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "quantum_compute_dft_tpu_jax"
)
_cache_dir = os.environ.get("DFT_JAX_CACHE", "")
if _cache_dir == "1":  # "1" means "on at the default location", not a dir named 1/
    _cache_dir = _DEFAULT_CACHE
if not _cache_dir:
    try:
        _on_tpu = any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        _on_tpu = False
    if _on_tpu:
        _cache_dir = _DEFAULT_CACHE
if _cache_dir and _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Default dtype for the parity path.
DTYPE = "float64"

# The density/gradient floors analogous to the reference guards
# (src/dft_solver.cu:12-13) live in xc/functionals.py (RHO_EPS/MIN_GRAD),
# raised to 1e-10/1e-18 for TPU float-float's f32 exponent range.


def default_backend() -> str:
    return os.environ.get("JAX_PLATFORMS", "").split(",")[0] or jax.default_backend()
