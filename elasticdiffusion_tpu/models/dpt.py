"""DPT monocular depth estimation in Flax (SURVEY C21, depth branch).

The reference's depth-ControlNet path runs
`transformers.pipeline('depth-estimation')` — a DPT model —
(/root/reference/elastic_diffusion_w_controlnet.py:183, 1102-1117). This is
the TPU-native equivalent: a ViT backbone with hooked intermediate layers,
DPT reassemble/fusion neck and depth head, matching the numerics of
`transformers.DPTForDepthEstimation` (non-hybrid, readout_type='project')
so the Intel/dpt-large checkpoint converts mechanically
(models/convert.py:convert_dpt). Golden-tested against the torch
implementation with shared weights in tests/test_dpt.py.

TPU-first notes: NHWC feature maps, fp32 layer norms, one jitted forward per
input resolution (position embeddings are bilinear-resized to the patch grid
like the torch code, so any multiple-of-patch size works).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DPTDepthConfig:
    """Mirrors transformers.DPTConfig (non-hybrid subset)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 384  # pos-embed native grid (384/16 = 24)
    backbone_out_indices: Tuple[int, ...] = (5, 11, 17, 23)
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    layer_norm_eps: float = 1e-12


DPT_LARGE = DPTDepthConfig()  # Intel/dpt-large

# tiny config for CPU tests / random-init plumbing
DPT_TEST = DPTDepthConfig(
    hidden_size=32, num_layers=4, num_heads=2, intermediate_size=64,
    patch_size=16, image_size=64, backbone_out_indices=(0, 1, 2, 3),
    neck_hidden_sizes=(16, 24, 32, 32), fusion_hidden_size=24)


def _resize_bilinear(x, size, align_corners: bool):
    """NHWC bilinear resize. align_corners=False matches torch's default
    (half-pixel centers == jax.image.resize 'linear'); align_corners=True is
    the DPT fusion/head convention and is computed by explicit gather-lerp."""
    B, H, W, C = x.shape
    oh, ow = size
    if not align_corners:
        return jax.image.resize(x, (B, oh, ow, C), method="linear")

    def coords(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.zeros((n_out,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)

    ys, xs = coords(H, oh), coords(W, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class _ViTLayer(nn.Module):
    cfg: DPTDepthConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps,
                                       dtype=jnp.float32, name=name)
        h = ln("layernorm_before")(x.astype(jnp.float32)).astype(x.dtype)
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(h)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(h)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(h)
        B, S, _ = q.shape
        split = lambda a: a.reshape(B, S, c.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k),
                            preferred_element_type=jnp.float32) / hd ** 0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v)).reshape(B, S, -1)
        x = x + nn.Dense(c.hidden_size, dtype=self.dtype, name="attn_out")(att)
        h = ln("layernorm_after")(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype,
                     name="intermediate")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(h)
        return x + h


class _PreActResidual(nn.Module):
    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="convolution1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="convolution2")(h)
        return x + h


class _FusionLayer(nn.Module):
    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = _resize_bilinear(residual, x.shape[1:3],
                                            align_corners=False)
            x = x + _PreActResidual(self.features, self.dtype,
                                    name="residual_layer1")(residual)
        x = _PreActResidual(self.features, self.dtype,
                            name="residual_layer2")(x)
        x = _resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]),
                             align_corners=True)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="projection")(x)


class DPTDepthModel(nn.Module):
    """pixel_values (B, 3, H, W) normalized -> predicted depth (B, H, W)."""

    config: DPTDepthConfig = DPT_LARGE
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        c = self.config
        p = c.patch_size
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        B, H, W, _ = x.shape
        assert H % p == 0 and W % p == 0, f"input must be a multiple of {p}"
        gh, gw = H // p, W // p

        # --- ViT backbone with hooked intermediate layers ---
        emb = nn.Conv(c.hidden_size, (p, p), strides=(p, p), dtype=self.dtype,
                      name="patch_embeddings")(x)            # (B, gh, gw, D)
        emb = emb.reshape(B, gh * gw, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.hidden_size), jnp.float32)
        g0 = c.image_size // p
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, g0 * g0 + 1, c.hidden_size), jnp.float32)
        pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
        pos_grid = pos_grid.reshape(1, g0, g0, c.hidden_size)
        pos_grid = _resize_bilinear(pos_grid, (gh, gw), align_corners=False)
        pos = jnp.concatenate(
            [pos_tok, pos_grid.reshape(1, gh * gw, c.hidden_size)], axis=1)
        h = jnp.concatenate([jnp.broadcast_to(cls.astype(emb.dtype),
                                              (B, 1, c.hidden_size)), emb],
                            axis=1) + pos.astype(emb.dtype)

        hooked = {}
        want = set(c.backbone_out_indices)
        for i in range(c.num_layers):
            h = _ViTLayer(c, self.dtype, name=f"layer_{i}")(h)
            if i in want:
                hooked[i] = h

        # --- reassemble: readout-project, 1x1 proj, resize ---
        feats = []
        for j, idx in enumerate(c.backbone_out_indices):
            t = hooked[idx]
            cls_t, tok = t[:, :1], t[:, 1:]
            rd = jnp.concatenate(
                [tok, jnp.broadcast_to(cls_t, tok.shape)], axis=-1)
            tok = nn.Dense(c.hidden_size, dtype=self.dtype,
                           name=f"readout_project_{j}")(rd)
            tok = nn.gelu(tok, approximate=False)
            f = tok.reshape(B, gh, gw, c.hidden_size)
            nh = c.neck_hidden_sizes[j]
            f = nn.Conv(nh, (1, 1), dtype=self.dtype,
                        name=f"reassemble_proj_{j}")(f)
            fac = c.reassemble_factors[j]
            if fac > 1:
                k = int(fac)
                f = nn.ConvTranspose(nh, (k, k), strides=(k, k),
                                     dtype=self.dtype,
                                     name=f"reassemble_resize_{j}")(f)
            elif fac < 1:
                s = int(round(1 / fac))
                f = nn.Conv(nh, (3, 3), strides=(s, s),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"reassemble_resize_{j}")(f)
            f = nn.Conv(c.fusion_hidden_size, (3, 3), use_bias=False,
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"neck_conv_{j}")(f)
            feats.append(f)

        # --- fusion, deepest first ---
        fused = None
        for j, f in enumerate(reversed(feats)):
            layer = _FusionLayer(c.fusion_hidden_size, self.dtype,
                                 name=f"fusion_{j}")
            fused = layer(f) if fused is None else layer(fused, f)

        # --- head ---
        fh = c.fusion_hidden_size
        h = nn.Conv(fh // 2, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="head_conv1")(fused)
        h = _resize_bilinear(h, (2 * h.shape[1], 2 * h.shape[2]),
                             align_corners=True)
        h = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(h)
        h = nn.relu(h)
        return h[..., 0].astype(jnp.float32)                 # (B, H, W)


# ImageNet normalization used by the DPT image processor
DPT_MEAN = (0.5, 0.5, 0.5)
DPT_STD = (0.5, 0.5, 0.5)


def make_depth_fn(params=None, config: DPTDepthConfig = DPT_LARGE,
                  proc_size: int = 384, seed: int = 0):
    """Build a depth_fn(image) -> (H, W) float32 depth map, the hook
    apps/preprocessors.process_condition_image consumes.

    params=None random-initializes (zero-egress plumbing mode, the output is
    deterministic noise-depth); pass a converted Intel/dpt-large pytree
    (models/convert.py:convert_dpt) for real estimates. Mirrors the
    transformers pipeline: resize to proc_size, normalize mean/std 0.5,
    predict, bilinear-resize back to the input size.
    """
    import numpy as np

    model = DPTDepthModel(config)
    if params is None:
        init_x = jnp.zeros((1, 3, proc_size, proc_size))
        params = model.init(jax.random.PRNGKey(seed), init_x)["params"]

    @jax.jit
    def fwd(x):
        return model.apply({"params": params}, x)

    def depth_fn(image):
        arr = np.asarray(image, dtype=np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        h0, w0 = arr.shape[:2]
        x = jax.image.resize(jnp.asarray(arr), (proc_size, proc_size, 3),
                             method="linear")
        x = (x - jnp.asarray(DPT_MEAN)) / jnp.asarray(DPT_STD)
        x = jnp.transpose(x, (2, 0, 1))[None]
        d = fwd(x)[0]
        d = jax.image.resize(d, (h0, w0), method="linear")
        return np.asarray(d)

    return depth_fn
