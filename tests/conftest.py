"""Test config: run everything on a virtual 8-device CPU mesh.

NOTE: this environment preimports jax via sitecustomize, so JAX_PLATFORMS
set here is too late — use jax.config.update instead. XLA_FLAGS is read at
(lazy) backend init, so setting it here still works as long as no test ran
a computation first.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} "
    f"on {jax.default_backend()}")
