"""Test harness: run everything on a virtual 8-device CPU mesh (SURVEY §4.5).

Must set XLA flags before jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

from elasticdiffusion_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
