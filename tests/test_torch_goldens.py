"""Golden tests: Flax blocks vs torch.nn compositions with SHARED weights.

VERDICT r1 item 6: the synthetic-layout tests check converter key/shape
mapping but never values. Here each Flax block (models/layers.py) runs
against a torch.nn module mirroring the diffusers semantics it implements
(SURVEY §2.4.2-2.4.3), with the torch state_dict pushed through the real
converter mapping (models/convert.py) — catching transpose/eps/padding bugs
on both sides. The CLIP test goes further: the oracle is the GENUINE
transformers CLIPTextModel (installed, random-init), not a transcription.

All comparisons fp32 on CPU. Channel counts are >=128 so GroupNorm grouping
matches torch's 32 groups exactly (GroupNorm32 clamps group size >= 4 only
for tiny toy channels).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax.numpy as jnp

from elasticdiffusion_tpu.models import layers as L
from elasticdiffusion_tpu.models.convert import (
    _lin, _map_attention, _map_resnet, _map_transformer2d,
    _map_vae_attention, _set, convert_clip,
)

ATOL = 3e-5
RTOL = 1e-4


def nhwc(x_t):
    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 1))


def as_nchw(y_nhwc):
    return np.asarray(y_nhwc).transpose(0, 3, 1, 2)


def sd_np(mod, prefix):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}


def close(got, want):
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


# ------------------------------------------------------------ GroupNorm32

@pytest.mark.parametrize("eps", [1e-5, 1e-6])
def test_groupnorm_vs_torch(eps):
    torch.manual_seed(0)
    C = 128
    gn = tnn.GroupNorm(32, C, eps=eps)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(C) * 0.5 + 1)
        gn.bias.copy_(torch.randn(C) * 0.1)
    x = torch.randn(2, C, 8, 12)
    want = gn(x).detach().numpy()

    params = {"GroupNorm_0": {"scale": gn.weight.detach().numpy(),
                              "bias": gn.bias.detach().numpy()}}
    got = L.GroupNorm32(epsilon=eps).apply({"params": params}, nhwc(x))
    close(as_nchw(got), want)


# ---------------------------------------------------------- ResnetBlock2D

class TorchResnet(tnn.Module):
    """diffusers ResnetBlock2D semantics (GN-SiLU-conv, +temb, GN-SiLU-conv,
    optional 1x1 shortcut)."""

    def __init__(self, cin, cout, temb_dim=None, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(32, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return skip + h


@pytest.mark.parametrize("cin,cout,use_temb,eps", [
    (128, 256, True, 1e-5),   # UNet down resnet with channel change
    (128, 128, True, 1e-5),   # UNet same-channel resnet
    (128, 128, False, 1e-6),  # VAE resnet (no temb, eps 1e-6)
])
def test_resnet_block_vs_torch(cin, cout, use_temb, eps):
    torch.manual_seed(1)
    temb_dim = 64 if use_temb else None
    ref = TorchResnet(cin, cout, temb_dim, eps).eval()
    x = torch.randn(2, cin, 8, 8)
    temb = torch.randn(2, temb_dim) if use_temb else None
    with torch.no_grad():
        want = ref(x, temb).numpy()

    out = {}
    _map_resnet(sd_np(ref, "r"), "r", out, "m")
    got = L.ResnetBlock2D(out_channels=cout, use_temb=use_temb,
                          norm_eps=eps).apply(
        {"params": out["m"]}, nhwc(x),
        jnp.asarray(temb.numpy()) if use_temb else None)
    close(as_nchw(got), want)


# --------------------------------------------------------- CrossAttention

class TorchAttention(tnn.Module):
    """diffusers Attention: to_q/k/v (+opt bias), to_out.0 Linear, SDPA."""

    def __init__(self, dim, heads, head_dim, ctx_dim=None, bias=False):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner, bias=bias)
        self.to_k = tnn.Linear(ctx_dim or dim, inner, bias=bias)
        self.to_v = tnn.Linear(ctx_dim or dim, inner, bias=bias)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        B, S, _ = q.shape

        def split(t):
            return t.view(B, -1, self.heads, self.head_dim).transpose(1, 2)

        out = F.scaled_dot_product_attention(split(q), split(k), split(v))
        out = out.transpose(1, 2).reshape(B, S, -1)
        return self.to_out[0](out)


@pytest.mark.parametrize("heads,head_dim,cross,bias", [
    (8, 16, False, False),   # UNet self-attention
    (8, 16, True, False),    # UNet cross-attention
    (1, 128, False, True),   # VAE-style single head with qkv bias
])
def test_cross_attention_vs_torch(heads, head_dim, cross, bias):
    torch.manual_seed(2)
    dim = heads * head_dim
    ctx_dim = 96 if cross else None
    ref = TorchAttention(dim, heads, head_dim, ctx_dim, bias).eval()
    x = torch.randn(2, 24, dim)
    ctx = torch.randn(2, 11, ctx_dim) if cross else None
    with torch.no_grad():
        want = ref(x, ctx).numpy()

    out = {}
    _map_attention(sd_np(ref, "a"), "a", out, "m")
    got = L.CrossAttention(num_heads=heads, head_dim=head_dim, qkv_bias=bias,
                           use_pallas="off").apply(
        {"params": out["m"]}, jnp.asarray(x.numpy()),
        jnp.asarray(ctx.numpy()) if cross else None)
    close(np.asarray(got), want)


# ----------------------------------------------------------- Transformer2D

class TorchGEGLU(tnn.Module):
    def __init__(self, dim, mult):
        super().__init__()
        self.proj = tnn.Linear(dim, dim * mult * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TorchFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.ModuleList(
            [TorchGEGLU(dim, mult), tnn.Identity(), tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TorchBasicBlock(tnn.Module):
    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, heads, head_dim, ctx_dim=ctx_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TorchTransformer2D(tnn.Module):
    def __init__(self, ch, heads, head_dim, ctx_dim, depth, linear):
        super().__init__()
        self.linear = linear
        self.norm = tnn.GroupNorm(32, ch, eps=1e-6)
        mk = (lambda: tnn.Linear(ch, ch)) if linear else \
             (lambda: tnn.Conv2d(ch, ch, 1))
        self.proj_in, self.proj_out = mk(), mk()
        self.transformer_blocks = tnn.ModuleList(
            [TorchBasicBlock(ch, heads, head_dim, ctx_dim) for _ in range(depth)])

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x)
        if self.linear:
            h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h).permute(0, 2, 3, 1).reshape(B, H * W, C)
        for b in self.transformer_blocks:
            h = b(h, ctx)
        if self.linear:
            h = self.proj_out(h)
            h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        else:
            h = self.proj_out(h.reshape(B, H, W, C).permute(0, 3, 1, 2))
        return h + res


@pytest.mark.parametrize("linear,depth", [(False, 1), (True, 2)])
def test_transformer2d_vs_torch(linear, depth):
    torch.manual_seed(3)
    ch, heads, head_dim, ctx_dim = 128, 8, 16, 96
    ref = TorchTransformer2D(ch, heads, head_dim, ctx_dim, depth, linear).eval()
    x = torch.randn(2, ch, 8, 8)
    ctx = torch.randn(2, 11, ctx_dim)
    with torch.no_grad():
        want = ref(x, ctx).numpy()

    out = {}
    _map_transformer2d(sd_np(ref, "t"), "t", out, "m", depth, linear)
    got = L.Transformer2D(num_heads=heads, head_dim=head_dim, depth=depth,
                          use_linear_projection=linear, use_pallas="off").apply(
        {"params": out["m"]}, nhwc(x), jnp.asarray(ctx.numpy()))
    close(as_nchw(got), want)


# ------------------------------------------------- Down/Upsample & VAE attn

def test_downsample_unet_pad_vs_torch():
    torch.manual_seed(4)
    conv = tnn.Conv2d(128, 128, 3, stride=2, padding=1).eval()
    x = torch.randn(1, 128, 16, 16)
    with torch.no_grad():
        want = conv(x).numpy()
    from elasticdiffusion_tpu.models.convert import _conv
    params = {"conv": {"kernel": _conv(conv.weight.detach().numpy()),
                       "bias": conv.bias.detach().numpy()}}
    got = L.Downsample2D(out_channels=128, pad=(1, 1)).apply(
        {"params": params}, nhwc(x))
    close(as_nchw(got), want)


def test_downsample_vae_asymmetric_pad_vs_torch():
    """diffusers VAE Downsample2D: F.pad (0,1,0,1) then stride-2 conv pad=0."""
    torch.manual_seed(5)
    from elasticdiffusion_tpu.models.convert import _conv
    conv = tnn.Conv2d(128, 128, 3, stride=2, padding=0).eval()
    x = torch.randn(1, 128, 17, 15)  # odd sizes stress the asymmetry
    with torch.no_grad():
        want = conv(F.pad(x, (0, 1, 0, 1))).numpy()
    params = {"conv": {"kernel": _conv(conv.weight.detach().numpy()),
                       "bias": conv.bias.detach().numpy()}}
    got = L.Downsample2D(out_channels=128, pad=(0, 1)).apply(
        {"params": params}, nhwc(x))
    close(as_nchw(got), want)


def test_upsample_vs_torch():
    torch.manual_seed(6)
    from elasticdiffusion_tpu.models.convert import _conv
    conv = tnn.Conv2d(128, 128, 3, padding=1).eval()
    x = torch.randn(1, 128, 7, 9)
    with torch.no_grad():
        want = conv(F.interpolate(x, scale_factor=2, mode="nearest")).numpy()
    params = {"conv": {"kernel": _conv(conv.weight.detach().numpy()),
                       "bias": conv.bias.detach().numpy()}}
    got = L.Upsample2D(out_channels=128).apply({"params": params}, nhwc(x))
    close(as_nchw(got), want)


class TorchVAEAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        out = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None])[:, 0]
        out = self.to_out[0](out)
        return x + out.reshape(B, H, W, C).permute(0, 3, 1, 2)


def test_vae_attention_vs_torch():
    torch.manual_seed(7)
    ch = 128
    ref = TorchVAEAttn(ch).eval()
    x = torch.randn(1, ch, 6, 6)
    with torch.no_grad():
        want = ref(x).numpy()
    out = {}
    _map_vae_attention(sd_np(ref, "a"), "a", out, "m")
    got = L.VAEAttention().apply({"params": out["m"]}, nhwc(x))
    close(as_nchw(got), want)


# -------------------------------------------- TimestepEmbedding & sinusoid

def test_timestep_embedding_vs_torch():
    torch.manual_seed(8)
    l1, l2 = tnn.Linear(320, 1280).eval(), tnn.Linear(1280, 1280).eval()
    t = torch.randn(2, 320)
    with torch.no_grad():
        want = l2(F.silu(l1(t))).numpy()
    params = {"linear_1": {"kernel": _lin(l1.weight.detach().numpy()),
                           "bias": l1.bias.detach().numpy()},
              "linear_2": {"kernel": _lin(l2.weight.detach().numpy()),
                           "bias": l2.bias.detach().numpy()}}
    got = L.TimestepEmbedding(embed_dim=1280).apply(
        {"params": params}, jnp.asarray(t.numpy()))
    close(np.asarray(got), want)


# ------------------------------- whole text encoder vs REAL transformers

@pytest.mark.parametrize("with_projection", [False, True])
def test_clip_text_model_vs_real_transformers(with_projection):
    """Oracle = the genuine transformers CLIPTextModel(WithProjection),
    random-init at a tiny config, weights moved through convert_clip.
    Validates penultimate-hidden-state semantics, causal masking, EOS
    pooling, quick_gelu, and every converter transpose in one shot."""
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=32, projection_dim=48,
        eos_token_id=98, bos_token_id=97)
    torch.manual_seed(9)
    cls = (transformers.CLIPTextModelWithProjection if with_projection
           else transformers.CLIPTextModel)
    hf = cls(hf_cfg).eval()

    ids = torch.randint(1, 97, (2, 32))
    ids[:, 0] = 97
    ids[0, 10:] = 98  # EOS then padding-ish tail
    ids[1, 20:] = 98
    with torch.no_grad():
        hf_out = hf(ids, output_hidden_states=True)
    want_last = hf_out.last_hidden_state.numpy()
    want_penult = hf_out.hidden_states[-2].numpy()
    want_pooled = (hf_out.text_embeds if with_projection
                   else hf_out.pooler_output).numpy()

    from elasticdiffusion_tpu.configs import CLIPTextConfig
    from elasticdiffusion_tpu.models.clip import CLIPTextModel

    cfg = CLIPTextConfig(vocab_size=99, hidden_size=64, num_layers=3,
                         num_heads=4, intermediate_size=128,
                         max_position_embeddings=32,
                         projection_dim=48 if with_projection else None)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_clip(sd, cfg)
    last, penult, pooled = CLIPTextModel(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy().astype(np.int32)))

    close(np.asarray(last), want_last)
    close(np.asarray(penult), want_penult)
    close(np.asarray(pooled), want_pooled)
