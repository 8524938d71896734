"""Test configuration: force CPU with 8 virtual devices.

Tests must not touch the (single, contended) TPU; multi-chip sharding
paths are exercised on a virtual CPU mesh instead, per SURVEY.md section 4.
The axon sitecustomize force-registers the TPU plugin and overrides
JAX_PLATFORMS, so we re-override before JAX initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which wins over the env var -- override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
