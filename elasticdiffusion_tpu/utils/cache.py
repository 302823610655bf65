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


def cache_dir(path: str = None) -> str:
    return path or os.environ.get("ED_JAX_CACHE_DIR",
                                  os.path.expanduser("~/.cache/ed_jax_cache"))


def enable_compilation_cache(path: str = None):
    set_fp32_matmul_precision()
    path = cache_dir(path)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# scan_depth cache-priming marker
#
# RuntimeConfig.scan_depth='on' compiles 3.5x slower cold (668 vs 189 s,
# artifacts/SCAN_COMPILE_AB.json) on the remote compile service; its
# steady-state speed measured flat vs 'off' at the full step
# (artifacts/SCAN_STEP_AB_r05.json). The persistent compilation cache is
# proven to work across processes on this service
# (artifacts/CACHE_CROSSPROC.json: cold 37 s -> warm 1-2 s in fresh
# processes), so the 668 s is a ONE-TIME cost: tools/prime_cache.py pays it
# once and drops a marker; 'auto' then resolves to ON for that exact model
# topology on this host. Unprimed hosts stay off — first-use latency wins
# by default (VERDICT r4 next #1a).
# ---------------------------------------------------------------------------


def _scan_marker_path(unet_cfg, param_dtype, path: str = None) -> str:
    import hashlib
    fp = hashlib.sha1(repr((jax.__version__, unet_cfg,
                            str(param_dtype))).encode()).hexdigest()[:16]
    return os.path.join(cache_dir(path), f"ed_scan_primed_{fp}")


def scan_primed(unet_cfg, param_dtype, path: str = None) -> bool:
    """True when tools/prime_cache.py has compiled the scan-on chain for
    this exact (jax version, UNet topology, param dtype) into the
    persistent cache on this host."""
    return os.path.exists(_scan_marker_path(unet_cfg, param_dtype, path))


def mark_scan_primed(unet_cfg, param_dtype, note: str = "",
                     path: str = None) -> str:
    p = _scan_marker_path(unet_cfg, param_dtype, path)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(note or "primed")
    return p
