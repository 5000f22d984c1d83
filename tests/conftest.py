"""Test config: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware, and keep matmul precision high for parity checks.

Note: this environment's sitecustomize registers an 'axon' TPU platform and
force-sets jax_platforms at interpreter start, so the env-var route
(JAX_PLATFORMS=cpu) is overridden — we must update jax.config *after*
import, before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
