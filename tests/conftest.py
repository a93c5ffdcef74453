"""Test configuration: run JAX on CPU with 8 virtual devices.

This exercises the exact sharding / halo / gather code paths without TPU
hardware (the driver separately dry-runs the multi-chip path).  float64 is
enabled so parity tests against the reference's float64 numpy can use tight
tolerances; the engine still defaults to float32 compute.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone does not stick in this environment (the axon TPU plugin
# still registers and wins); the config update reliably forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
