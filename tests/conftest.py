"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers a TPU PJRT plugin and pins
JAX_PLATFORMS to it, so the env var alone is not enough — the jax config
must be updated before any backend initializes. Multi-chip sharding tests
then work without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from eitx.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/eitx_xla_cpu"))
