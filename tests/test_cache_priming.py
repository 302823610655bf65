"""scan_depth cache-priming marker + resolution (VERDICT r4 next #1a).

tools/prime_cache.py pays the scan-on chain's 3.5x cold compile once into
the persistent compilation cache and drops a host-local marker
(utils/cache.mark_scan_primed); RuntimeConfig.scan_depth='auto' must then
resolve ON for exactly that (model topology, param dtype) and stay OFF
everywhere else — an unprimed host must never eat the 668 s cold compile
by default (artifacts/SCAN_COMPILE_AB.json).
"""

import jax.numpy as jnp

from elasticdiffusion_tpu.models.registry import _scan_depth_on
from elasticdiffusion_tpu.utils.cache import mark_scan_primed, scan_primed

from toy_configs import TOY_UNET, TOY_UNET_XL, TOY_RUNTIME, toy_bundle_config


def test_marker_roundtrip_keyed_by_topology_and_dtype(tmp_path, monkeypatch):
    monkeypatch.setenv("ED_JAX_CACHE_DIR", str(tmp_path))
    assert not scan_primed(TOY_UNET, jnp.float32)
    marker = mark_scan_primed(TOY_UNET, jnp.float32, note="test")
    assert marker.startswith(str(tmp_path))
    assert scan_primed(TOY_UNET, jnp.float32)
    # a different param dtype or UNet topology is a different compiled
    # program — its cache is NOT primed by this marker
    assert not scan_primed(TOY_UNET, jnp.bfloat16)
    assert not scan_primed(TOY_UNET_XL, jnp.float32)


def test_auto_resolves_on_iff_primed(tmp_path, monkeypatch):
    monkeypatch.setenv("ED_JAX_CACHE_DIR", str(tmp_path))
    cfg = toy_bundle_config()
    rt_auto = TOY_RUNTIME  # scan_depth='auto' is the dataclass default
    assert rt_auto.scan_depth == "auto"
    assert _scan_depth_on(rt_auto, cfg) is False
    mark_scan_primed(cfg.unet, rt_auto.param_dtype)
    assert _scan_depth_on(rt_auto, cfg) is True


def test_explicit_on_off_ignore_marker(tmp_path, monkeypatch):
    import dataclasses
    monkeypatch.setenv("ED_JAX_CACHE_DIR", str(tmp_path))
    cfg = toy_bundle_config()
    rt_on = dataclasses.replace(TOY_RUNTIME, scan_depth="on")
    rt_off = dataclasses.replace(TOY_RUNTIME, scan_depth="off")
    assert _scan_depth_on(rt_on, cfg) is True    # unprimed: 'on' still on
    mark_scan_primed(cfg.unet, rt_off.param_dtype)
    assert _scan_depth_on(rt_off, cfg) is False  # primed: 'off' still off
