"""Halo-exchange tiled VAE decode (SURVEY §7.1.6, BASELINE north star).

The reference's tiled_decode zero-pads the latent, decodes overlapping tiles
and count-averages (/root/reference/elastic_diffusion.py:275-310) — slow and
known to produce checkerboard seams (README.md:114). Two observations drive
the redesign:

  1. the decoder's only global *attention* is in the mid block, which runs at
     1/8 resolution — so stage A (post_quant/conv_in/mid) is computed once on
     the full latent, replicated (cheap);
  2. stage B (the 8x upsampling stack) is convs + GroupNorms. Convs have a
     1-px receptive field per layer — under shard_map each band exchanges
     one-row halos with its neighbors via ppermute before every 3x3 conv
     (edges receive zeros, exactly like monolithic conv padding). GroupNorm
     statistics are GLOBAL over (H, W) — they are computed from per-band
     moments psum-reduced over the 'views' axis (bands are disjoint, so the
     reduction is exact).

Result: the multi-chip halo decode equals monolithic decode exactly (up to
compile-order float noise) — no seams, no averaging — while each chip only
materializes 1/n of the full-resolution activations.

The single-chip fallback decodes sequential halo bands with PER-BAND GN
stats: a memory-bounded approximation in the same class as the reference's
tiles, but without count-averaging seams in the conv path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

DEFAULT_HALO = 16  # sequential-band mode: conv RF of stage B is ~13 latent px


def _gn_groups(C: int, num_groups: int = 32) -> int:
    g = num_groups if C % num_groups == 0 else math.gcd(C, num_groups)
    return max(1, min(g, C // 4))


def _group_norm(x, scale, bias, axis_name: Optional[str], eps: float = 1e-6):
    """GroupNorm over (H, W, group) in fp32; moments psum'd over axis_name."""
    B, H, W, C = x.shape
    g = _gn_groups(C)
    xf = x.astype(jnp.float32).reshape(B, H * W, g, C // g)
    s1 = jnp.sum(xf, axis=(1, 3))            # (B, g)
    s2 = jnp.sum(xf * xf, axis=(1, 3))
    cnt = jnp.asarray(H * W * (C // g), jnp.float32)
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    mean = s1 / cnt
    var = s2 / cnt - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    out = (xf - mean[:, None, :, None]) * inv[:, None, :, None]
    out = out.reshape(B, H, W, C)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _conv(x, kernel, bias, h_pad, w_pad=(1, 1)):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=(h_pad, w_pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias.astype(x.dtype)


def _conv3x3_halo(x, kernel, bias, axis_name: Optional[str]):
    """3x3 conv with one-row halo exchange along H when sharded.

    ppermute with a non-wrapping perm delivers zeros to the boundary bands —
    exactly the zero padding monolithic conv applies at true image edges.
    """
    if axis_name is None:
        return _conv(x, kernel, bias, h_pad=(1, 1))
    n = jax.lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]   # my last row -> next band
    up = [(i + 1, i) for i in range(n - 1)]     # my first row -> prev band
    top = jax.lax.ppermute(x[:, -1:], axis_name, down)
    bottom = jax.lax.ppermute(x[:, :1], axis_name, up)
    xp = jnp.concatenate([top, x, bottom], axis=1)
    return _conv(xp, kernel, bias, h_pad=(0, 0))


def _resnet(x, p, axis_name):
    h = _group_norm(x, p["norm1"]["GroupNorm_0"]["scale"],
                    p["norm1"]["GroupNorm_0"]["bias"], axis_name)
    h = jax.nn.silu(h)
    h = _conv3x3_halo(h, p["conv1"]["kernel"], p["conv1"]["bias"], axis_name)
    h = _group_norm(h, p["norm2"]["GroupNorm_0"]["scale"],
                    p["norm2"]["GroupNorm_0"]["bias"], axis_name)
    h = jax.nn.silu(h)
    h = _conv3x3_halo(h, p["conv2"]["kernel"], p["conv2"]["bias"], axis_name)
    if "conv_shortcut" in p:
        x = _conv(x, p["conv_shortcut"]["kernel"], p["conv_shortcut"]["bias"],
                  h_pad=(0, 0), w_pad=(0, 0))
    return x + h


def _stage_b(h_nhwc, dec_params, vae_cfg, axis_name: Optional[str]):
    """Functional stage B over one band (or the full tensor when
    axis_name is None). Mirrors models/vae.py Decoder stage 'b'."""
    bo = list(reversed(vae_cfg.block_out_channels))
    x = h_nhwc
    for i, _ in enumerate(bo):
        for j in range(vae_cfg.layers_per_block + 1):
            x = _resnet(x, dec_params[f"up_{i}_{j}"], axis_name)
        if i < len(bo) - 1:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            up = dec_params[f"up_{i}_upsample"]["conv"]
            x = _conv3x3_halo(x, up["kernel"], up["bias"], axis_name)
    x = _group_norm(x, dec_params["conv_norm_out"]["GroupNorm_0"]["scale"],
                    dec_params["conv_norm_out"]["GroupNorm_0"]["bias"],
                    axis_name)
    x = jax.nn.silu(x)
    return _conv3x3_halo(x, dec_params["conv_out"]["kernel"],
                         dec_params["conv_out"]["bias"], axis_name)


@functools.partial(jax.jit, static_argnames=("vae_cls", "cfg", "fp32",
                                              "use_pallas"))
def _stage_a_jit(params, lat, vae_cls, cfg, fp32, use_pallas="off"):
    # use_pallas is load-bearing: the mid-block attention at (H/8)^2 tokens
    # must run as the flash kernel or its logits alone exceed HBM
    vae = vae_cls(cfg, dtype=jnp.float32 if fp32 else lat.dtype,
                  use_pallas=use_pallas)
    if fp32:
        params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    hidden = vae.apply({"params": params}, lat, method=vae_cls.decode_stage_a)
    return jnp.transpose(hidden, (0, 2, 3, 1)), params["decoder"]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_b_mono_jit(hidden, dec, cfg):
    return _stage_b(hidden, dec, cfg, axis_name=None)


@functools.partial(jax.jit, static_argnames=("cfg", "n", "halo", "vsf"))
def _stage_b_bands_jit(hidden, dec, cfg, n, halo, vsf):
    B, H = hidden.shape[0], hidden.shape[1]
    W = hidden.shape[2]
    hs = H // n
    win = min(H, hs + 2 * halo)

    def band(i):
        start = jnp.clip(i * hs - halo, 0, H - win)
        bandh = jax.lax.dynamic_slice_in_dim(hidden, start, win, axis=1)
        img = _stage_b(bandh, dec, cfg, axis_name=None)
        keep = (i * hs - start) * vsf
        return jax.lax.dynamic_slice_in_dim(img, keep, hs * vsf, axis=1)

    bands = jax.lax.map(band, jnp.arange(n))      # (n, B, hs*vsf, W*vsf, 3)
    bands = jnp.moveaxis(bands, 0, 1)
    return bands.reshape(B, n * hs * vsf, W * vsf, -1)


def halo_decode(bundle, latents_nchw, mesh: Optional[Mesh] = None,
                halo: int = DEFAULT_HALO, num_bands: Optional[int] = None):
    """(B, 4, H, W) scaled latents -> (B, 3, 8H, 8W) image in [-1, 1].

    Multi-chip (mesh with a 'views' axis > 1): EXACT halo-exchange decode.
    Single-chip: sequential approximate bands when num_bands > 1, else
    monolithic stage B (exact). Every branch runs as a jitted program
    (eager op-by-op execution would hold all intermediates live — OOM at
    2048^2 fp32 — and dispatch one remote program per op on this backend).
    """
    B, C, H, W = latents_nchw.shape
    vsf = bundle.vae_scale_factor

    fp32 = (bundle.config.vae.force_upcast and bundle.runtime.vae_decode_fp32
            and bundle.vae_fp32 is not None)
    vae = bundle.vae_fp32 if fp32 else bundle.vae
    lat = latents_nchw.astype(jnp.float32 if fp32 else latents_nchw.dtype)
    cfg = bundle.config.vae

    hidden, dec = _stage_a_jit(bundle.vae_params, lat, type(vae), cfg, fp32,
                               use_pallas=vae.use_pallas)

    n_mesh = int(mesh.shape["views"]) if (mesh is not None
                                          and "views" in mesh.axis_names) else 1
    if n_mesh > 1 and H % n_mesh == 0:
        from jax.experimental.shard_map import shard_map

        def fn(h_band):
            return _stage_b(h_band, dec, cfg, axis_name="views")

        out = shard_map(fn, mesh=mesh,
                        in_specs=(P(None, "views", None, None),),
                        out_specs=P(None, "views", None, None),
                        check_rep=False)(hidden)
        return jnp.transpose(out, (0, 3, 1, 2))

    n = num_bands or 1
    n = max(1, min(n, H))
    while H % n:
        n -= 1
    if n == 1:
        out = _stage_b_mono_jit(hidden, dec, cfg)
        return jnp.transpose(out, (0, 3, 1, 2))

    out = _stage_b_bands_jit(hidden, dec, cfg, n, halo, vsf)
    return jnp.transpose(out, (0, 3, 1, 2))
