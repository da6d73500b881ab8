"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and a
sitecustomize imports jax at interpreter start, so plain env-var edits are too
late — force the platform through jax.config instead, and add the virtual
host-device flag before the CPU backend first initializes (SURVEY.md §4:
multi-host tests on a CPU mesh via --xla_force_host_platform_device_count).
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
