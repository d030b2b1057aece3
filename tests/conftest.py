"""Test configuration: run on a virtual 8-device CPU mesh with f64 enabled.

Real-TPU behavior is exercised by bench.py and the driver's entry checks;
the test suite validates numerics against the NumPy oracle on CPU, where
float64 is native.

Note: this environment's sitecustomize force-registers the remote TPU
('axon') PJRT plugin regardless of JAX_PLATFORMS, so the platform must be
overridden through jax.config after import, before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
