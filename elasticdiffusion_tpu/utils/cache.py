"""Persistent XLA compilation cache setup.

This host compiles small XLA executables slowly (~1-3s each); eager tracing
of model init touches dozens of unique ops. Enabling JAX's persistent
compilation cache makes repeat runs (tests, CLI invocations) near-instant.
"""

import os

import jax


def set_fp32_matmul_precision():
    """fp32 means fp32: JAX's default matmul precision downcasts fp32 matmul
    inputs to bf16 (on CPU too, as of jax 0.9). The framework's bf16 compute
    paths pass bf16 inputs explicitly and are unaffected; this only makes the
    intended-fp32 paths (VAE force_upcast decode/encode, fp32 parity runs,
    direction accumulation) actually fp32."""
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:
        pass


def enable_compilation_cache(path: str = None):
    set_fp32_matmul_precision()
    path = path or os.environ.get("ED_JAX_CACHE_DIR",
                                  os.path.expanduser("~/.cache/ed_jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
