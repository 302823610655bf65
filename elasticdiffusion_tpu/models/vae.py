"""AutoencoderKL in Flax (encoder, decoder, quant convs).

Behavioral contract (SURVEY §2.4.3; consumed at
/root/reference/elastic_diffusion.py:144, 267-272, 327-364): encode returns a
diagonal-Gaussian latent distribution sampled by the caller; decode maps
latents back to [-1,1] RGB; scaling_factor is applied by the pipeline;
force_upcast means the XL decoder runs in fp32 (RuntimeConfig.vae_decode_fp32
is the TPU analog of the reference's upcast_vae,
/root/reference/elastic_diffusion.py:178-195).

NHWC internally; NCHW at the public boundary.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from elasticdiffusion_tpu.configs import VAEConfig
from elasticdiffusion_tpu.models.layers import (
    Downsample2D, GroupNorm32, ResnetBlock2D, Upsample2D, VAEAttention,
)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "off"

    @nn.compact
    def __call__(self, x):  # NHWC
        cfg = self.config
        bo = cfg.block_out_channels
        x = nn.Conv(bo[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(bo):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, use_temb=False, norm_eps=1e-6, dtype=self.dtype,
                                  name=f"down_{i}_{j}")(x)
            if i < len(bo) - 1:
                # VAE downsample pads (0,1) per axis (diffusers Encoder)
                x = Downsample2D(ch, pad=(0, 1), dtype=self.dtype,
                                 name=f"down_{i}_downsample")(x)
        x = ResnetBlock2D(bo[-1], use_temb=False, norm_eps=1e-6, dtype=self.dtype,
                          name="mid_resnet_0")(x)
        x = VAEAttention(dtype=self.dtype, use_pallas=self.use_pallas,
                         name="mid_attn")(x)
        x = ResnetBlock2D(bo[-1], use_temb=False, norm_eps=1e-6, dtype=self.dtype,
                          name="mid_resnet_1")(x)
        x = GroupNorm32(epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    """Two-stage decoder: stage 'a' = conv_in + mid block (contains the
    GLOBAL attention, runs at cheap latent resolution); stage 'b' = the
    8x upsampling conv stack (finite receptive field). The split enables the
    exact seam-free halo decode (parallel/halo_decode.py) that replaces the
    reference's overlap-averaging tiled_decode
    (/root/reference/elastic_diffusion.py:275-310, seams noted README.md:114).
    """

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "off"

    @nn.compact
    def __call__(self, z, stage: str = "full"):  # NHWC
        cfg = self.config
        bo = list(reversed(cfg.block_out_channels))
        x = z
        if stage in ("full", "a"):
            x = nn.Conv(bo[0], (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="conv_in")(x)
            x = ResnetBlock2D(bo[0], use_temb=False, norm_eps=1e-6, dtype=self.dtype,
                              name="mid_resnet_0")(x)
            x = VAEAttention(dtype=self.dtype, use_pallas=self.use_pallas,
                         name="mid_attn")(x)
            x = ResnetBlock2D(bo[0], use_temb=False, norm_eps=1e-6, dtype=self.dtype,
                              name="mid_resnet_1")(x)
            if stage == "a":
                return x
        for i, ch in enumerate(bo):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(ch, use_temb=False, norm_eps=1e-6, dtype=self.dtype,
                                  name=f"up_{i}_{j}")(x)
            if i < len(bo) - 1:
                x = Upsample2D(ch, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = GroupNorm32(epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    # flash attention in the mid blocks: mandatory for large decodes (the
    # single-head latent-resolution attention materializes O(tokens^2)
    # logits otherwise — 5.4GB at 1536^2, OOM at 2048^2)
    use_pallas: str = "off"

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype,
                               use_pallas=self.use_pallas)
        self.decoder = Decoder(self.config, dtype=self.dtype,
                               use_pallas=self.use_pallas)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode_moments(self, images_nchw):
        """(B,3,H,W) in [-1,1] -> (mean, logvar), each (B,4,H/8,W/8)."""
        x = jnp.transpose(images_nchw, (0, 2, 3, 1)).astype(self.dtype)
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return (jnp.transpose(mean, (0, 3, 1, 2)),
                jnp.transpose(logvar, (0, 3, 1, 2)))

    def encode_sample(self, images_nchw, noise):
        """Sample the latent distribution with externally-supplied noise
        (parity-injectable, matching latent_dist.sample()
        /root/reference/elastic_diffusion.py:350)."""
        mean, logvar = self.encode_moments(images_nchw)
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        return mean.astype(jnp.float32) + std * noise

    def decode(self, latents_nchw):
        """(B,4,h,w) (already /scaling_factor) -> (B,3,8h,8w) in [-1,1]."""
        z = jnp.transpose(latents_nchw, (0, 2, 3, 1)).astype(self.dtype)
        img = self.decoder(self.post_quant_conv(z))
        return jnp.transpose(img, (0, 3, 1, 2))

    def decode_stage_a(self, latents_nchw):
        """post_quant_conv + conv_in + mid (global attention) at latent res.
        (B,4,h,w) -> (B,C_top,h,w) NCHW."""
        z = jnp.transpose(latents_nchw, (0, 2, 3, 1)).astype(self.dtype)
        h = self.decoder(self.post_quant_conv(z), stage="a")
        return jnp.transpose(h, (0, 3, 1, 2))

    def decode_stage_b(self, hidden_nchw):
        """Finite-receptive-field upsampling stack. (B,C_top,h,w)->(B,3,8h,8w)."""
        h = jnp.transpose(hidden_nchw, (0, 2, 3, 1)).astype(self.dtype)
        img = self.decoder(h, stage="b")
        return jnp.transpose(img, (0, 3, 1, 2))

    def __call__(self, images_nchw, noise):
        """Round trip (init convenience)."""
        z = self.encode_sample(images_nchw, noise)
        return self.decode(z.astype(self.dtype))
