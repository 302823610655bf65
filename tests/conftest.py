"""Test harness: virtual 8-device CPU mesh (SURVEY §4.5).

This environment PRELOADS jax at interpreter startup with JAX_PLATFORMS=axon
(the TPU tunnel), so env-var edits here are too late — but backend init is
lazy, so jax.config.update('jax_platforms', 'cpu') still works, and
XLA_FLAGS is only consumed when the CPU client initializes.

Running tests on the TPU tunnel instead of CPU shows up as: 1 device,
multi-minute toy-model compiles, and ~1e-3 'noise' (TPU fp32 matmuls default
to bf16 MXU passes).
"""

import os

# keep transformers (used by the real-reference oracle imports) from pulling
# in tensorflow — a ~36 s import on this 1-core host
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_TORCH", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from elasticdiffusion_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # also sets fp32 matmul precision to 'highest'

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
