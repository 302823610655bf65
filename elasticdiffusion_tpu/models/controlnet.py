"""ControlNet in Flax (SD1.x and SDXL variants).

Behavioral contract (SURVEY §2.4.5; consumed at
/root/reference/elastic_diffusion_w_controlnet.py:434-524): a copy of the
UNet's down+mid path with (a) a conditioning embedding that downsamples the
full-res RGB condition (in [0,1]) by 8x and adds it to conv_in output, and
(b) zero-initialized 1x1 convs on every residual. Returns per-down-block
residuals plus the mid residual, each scaled by conditioning_scale, which the
UNet consumes via down_block_residuals / mid_block_residual.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from elasticdiffusion_tpu.configs import ControlNetConfig
from elasticdiffusion_tpu.models.layers import (
    Downsample2D, ResnetBlock2D, TimestepEmbedding, Transformer2D,
    timestep_embedding,
)
from elasticdiffusion_tpu.models.unet import CrossAttnBlock


class ConditioningEmbedding(nn.Module):
    """RGB condition -> latent-resolution feature (log2(factor) stride-2
    convs; 3 for the real 8x VAEs)."""

    out_channels: int
    block_channels: Tuple[int, ...] = (16, 32, 96, 256)
    downsample_factor: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):  # NHWC in [0,1]
        import math
        k = int(math.log2(self.downsample_factor))
        ch = self.block_channels[-(k + 1):]
        x = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(ch) - 1):
            x = nn.Conv(ch[i], (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(ch[i + 1], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv_out")(x)


class ControlNet(nn.Module):
    config: ControlNetConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "auto"
    scan_depth: bool = False

    @nn.compact
    def __call__(self, sample_nchw, timesteps, encoder_hidden_states,
                 condition_nchw, conditioning_scale: float = 1.0,
                 added_text_embeds=None, added_time_ids=None):
        """Returns (down_residuals tuple of NHWC arrays, mid_residual NHWC)."""
        cfg = self.config.unet
        x = jnp.transpose(sample_nchw, (0, 2, 3, 1)).astype(self.dtype)
        cond = jnp.transpose(condition_nchw, (0, 2, 3, 1)).astype(self.dtype)
        B = x.shape[0]
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))
        context = encoder_hidden_states.astype(self.dtype)

        bo = cfg.block_out_channels
        t_emb = timestep_embedding(timesteps, bo[0], cfg.flip_sin_to_cos,
                                   cfg.freq_shift)
        temb_dim = bo[0] * 4
        emb = TimestepEmbedding(temb_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb.astype(self.dtype))
        if cfg.addition_embed_type == "text_time":
            tid = added_time_ids.reshape(-1)
            tid_emb = timestep_embedding(tid, cfg.addition_time_embed_dim,
                                         cfg.flip_sin_to_cos, cfg.freq_shift)
            tid_emb = tid_emb.reshape(B, -1)
            add_in = jnp.concatenate(
                [added_text_embeds.astype(jnp.float32), tid_emb], axis=-1)
            emb = emb + TimestepEmbedding(temb_dim, dtype=self.dtype,
                                          name="add_embedding")(
                                              add_in.astype(self.dtype))

        x = nn.Conv(bo[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x)
        x = x + ConditioningEmbedding(
            bo[0], self.config.conditioning_embedding_out_channels,
            downsample_factor=self.config.cond_downsample_factor,
            dtype=self.dtype, name="controlnet_cond_embedding")(cond)

        def zero_conv(h, name):
            return nn.Conv(h.shape[-1], (1, 1),
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=self.dtype, name=name)(h)

        residuals = [x]
        n_blocks = len(bo)
        for i in range(n_blocks):
            for j in range(cfg.layers_per_block):
                if cfg.down_block_has_attn[i]:
                    x = CrossAttnBlock(bo[i], cfg.heads_for_block(i),
                                       cfg.transformer_layers_per_block[i],
                                       cfg.use_linear_projection, self.dtype,
                                       self.use_pallas, self.scan_depth,
                                       name=f"down_{i}_{j}")(x, emb, context)
                else:
                    x = ResnetBlock2D(bo[i], dtype=self.dtype,
                                      use_pallas=self.use_pallas,
                                      name=f"down_{i}_{j}_resnet")(x, emb)
                residuals.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(bo[i], dtype=self.dtype,
                                 name=f"down_{i}_downsample")(x)
                residuals.append(x)

        x = ResnetBlock2D(bo[-1], dtype=self.dtype, use_pallas=self.use_pallas,
                          name="mid_resnet_0")(x, emb)
        x = Transformer2D(cfg.heads_for_block(n_blocks - 1),
                          bo[-1] // cfg.heads_for_block(n_blocks - 1),
                          depth=cfg.transformer_layers_per_block[-1],
                          use_linear_projection=cfg.use_linear_projection,
                          dtype=self.dtype, use_pallas=self.use_pallas,
                          scan_depth=self.scan_depth,
                          name="mid_attn")(x, context)
        x = ResnetBlock2D(bo[-1], dtype=self.dtype, use_pallas=self.use_pallas,
                          name="mid_resnet_1")(x, emb)

        down = tuple(conditioning_scale * zero_conv(r, f"controlnet_down_{k}")
                     for k, r in enumerate(residuals))
        mid = conditioning_scale * zero_conv(x, "controlnet_mid")
        return down, mid
