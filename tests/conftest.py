"""Test config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes. This mirrors the standard JAX
recipe for testing pmap/pjit sharding without TPU hardware.
"""

import os

# Force CPU: the session env sets JAX_PLATFORMS=axon (tunneled TPU); tests
# must run on the virtual 8-device CPU mesh for speed and f32 determinism.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
