"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding code is exercised without TPU hardware.

NOTE: this environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and the
plugin wins over a plain env-var override, so we must also force the
platform through jax.config before any device is touched.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
