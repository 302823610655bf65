"""Persistent XLA compilation cache setup.

This host compiles small XLA executables slowly (~1-3s each); eager tracing
of model init touches dozens of unique ops. Enabling JAX's persistent
compilation cache makes repeat runs (tests, CLI invocations) near-instant.
"""

import os

import jax


def enable_compilation_cache(path: str = None):
    path = path or os.environ.get("ED_JAX_CACHE_DIR",
                                  os.path.expanduser("~/.cache/ed_jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
