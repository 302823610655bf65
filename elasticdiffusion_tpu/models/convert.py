"""HF checkpoint -> Flax param conversion (SURVEY §5 'checkpoint/resume').

The reference pulls torch weights from the HF hub at init
(/root/reference/elastic_diffusion.py:144-153). The rebuild keeps loading the
SAME checkpoints: this module maps diffusers/transformers state dicts
(safetensors or torch .bin) onto the param trees of models/{unet,vae,clip,
controlnet}.py, and caches the converted pytrees as .npz so later runs skip
conversion.

Layout transforms:
  conv   torch (O,I,kh,kw) -> flax (kh,kw,I,O)
  linear torch (O,I)       -> flax (I,O)
  norms  weight/bias       -> scale/bias
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from elasticdiffusion_tpu.configs import (
    CLIPTextConfig, ModelBundleConfig, UNetConfig, VAEConfig,
    get_bundle_config,
)

# ---------------------------------------------------------------------------
# IO helpers
# ---------------------------------------------------------------------------


def _flatten(tree: Dict[str, Any], prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            # keep ShapeDtypeStructs (eval_shape trees) as-is
            out[prefix + (k,)] = v if hasattr(v, "shape") else np.asarray(v)
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def save_params_npz(params: Dict[str, Any], path: str):
    flat = {"/".join(k): v for k, v in _flatten(params).items()}
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        flat = {tuple(k.split("/")): data[k] for k in data.files}
    return _unflatten(flat)


def load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all safetensors/bin files of one HF model directory."""
    sd: Dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(model_dir)):
        fpath = os.path.join(model_dir, fname)
        if fname.endswith(".safetensors"):
            from safetensors.numpy import load_file
            sd.update(load_file(fpath))
        elif fname.endswith((".bin", ".pt", ".pth")):
            import torch
            t = torch.load(fpath, map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() if v.dtype == torch.float16
                       else v.numpy() for k, v in t.items()})
    if not sd:
        raise FileNotFoundError(f"no weight files found in {model_dir}")
    return sd


# ---------------------------------------------------------------------------
# Key mapping
# ---------------------------------------------------------------------------


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):
    return np.transpose(w, (1, 0))


def _set(out, path: str, value: np.ndarray):
    node = out
    keys = path.split(".")
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _map_resnet(sd, src: str, out, dst: str, prefix=""):
    p = lambda s: f"{prefix}{src}.{s}"
    _set(out, f"{dst}.norm1.GroupNorm_0.scale", sd[p("norm1.weight")])
    _set(out, f"{dst}.norm1.GroupNorm_0.bias", sd[p("norm1.bias")])
    _set(out, f"{dst}.conv1.kernel", _conv(sd[p("conv1.weight")]))
    _set(out, f"{dst}.conv1.bias", sd[p("conv1.bias")])
    if p("time_emb_proj.weight") in sd:
        _set(out, f"{dst}.time_emb_proj.kernel", _lin(sd[p("time_emb_proj.weight")]))
        _set(out, f"{dst}.time_emb_proj.bias", sd[p("time_emb_proj.bias")])
    _set(out, f"{dst}.norm2.GroupNorm_0.scale", sd[p("norm2.weight")])
    _set(out, f"{dst}.norm2.GroupNorm_0.bias", sd[p("norm2.bias")])
    _set(out, f"{dst}.conv2.kernel", _conv(sd[p("conv2.weight")]))
    _set(out, f"{dst}.conv2.bias", sd[p("conv2.bias")])
    if p("conv_shortcut.weight") in sd:
        _set(out, f"{dst}.conv_shortcut.kernel", _conv(sd[p("conv_shortcut.weight")]))
        _set(out, f"{dst}.conv_shortcut.bias", sd[p("conv_shortcut.bias")])


def _map_attention(sd, src: str, out, dst: str, prefix=""):
    """One CrossAttention (to_q/k/v/out, possibly biased)."""
    p = lambda s: f"{prefix}{src}.{s}"
    for name in ("to_q", "to_k", "to_v"):
        _set(out, f"{dst}.{name}.kernel", _lin(sd[p(f"{name}.weight")]))
        if p(f"{name}.bias") in sd:
            _set(out, f"{dst}.{name}.bias", sd[p(f"{name}.bias")])
    _set(out, f"{dst}.to_out.kernel", _lin(sd[p("to_out.0.weight")]))
    _set(out, f"{dst}.to_out.bias", sd[p("to_out.0.bias")])


def _map_transformer2d(sd, src: str, out, dst: str, depth: int,
                       use_linear_projection: bool, prefix=""):
    p = lambda s: f"{prefix}{src}.{s}"
    _set(out, f"{dst}.norm.GroupNorm_0.scale", sd[p("norm.weight")])
    _set(out, f"{dst}.norm.GroupNorm_0.bias", sd[p("norm.bias")])
    for io in ("proj_in", "proj_out"):
        w = sd[p(f"{io}.weight")]
        _set(out, f"{dst}.{io}.kernel", _lin(w) if use_linear_projection else _conv(w))
        _set(out, f"{dst}.{io}.bias", sd[p(f"{io}.bias")])
    for k in range(depth):
        b = f"transformer_blocks.{k}"
        d = f"{dst}.blocks_{k}"
        for n in ("norm1", "norm2", "norm3"):
            _set(out, f"{d}.{n}.scale", sd[p(f"{b}.{n}.weight")])
            _set(out, f"{d}.{n}.bias", sd[p(f"{b}.{n}.bias")])
        _map_attention(sd, f"{src}.{b}.attn1", out, f"{d}.attn1", prefix)
        _map_attention(sd, f"{src}.{b}.attn2", out, f"{d}.attn2", prefix)
        _set(out, f"{d}.ff.proj_in.kernel", _lin(sd[p(f"{b}.ff.net.0.proj.weight")]))
        _set(out, f"{d}.ff.proj_in.bias", sd[p(f"{b}.ff.net.0.proj.bias")])
        _set(out, f"{d}.ff.proj_out.kernel", _lin(sd[p(f"{b}.ff.net.2.weight")]))
        _set(out, f"{d}.ff.proj_out.bias", sd[p(f"{b}.ff.net.2.bias")])


def _map_unet_core(sd, out, cfg: UNetConfig, prefix=""):
    """Shared by UNet and ControlNet (down+mid)."""
    _set(out, "conv_in.kernel", _conv(sd[prefix + "conv_in.weight"]))
    _set(out, "conv_in.bias", sd[prefix + "conv_in.bias"])
    for l in ("linear_1", "linear_2"):
        _set(out, f"time_embedding.{l}.kernel",
             _lin(sd[f"{prefix}time_embedding.{l}.weight"]))
        _set(out, f"time_embedding.{l}.bias", sd[f"{prefix}time_embedding.{l}.bias"])
        if f"{prefix}add_embedding.{l}.weight" in sd:
            _set(out, f"add_embedding.{l}.kernel",
                 _lin(sd[f"{prefix}add_embedding.{l}.weight"]))
            _set(out, f"add_embedding.{l}.bias", sd[f"{prefix}add_embedding.{l}.bias"])

    n = len(cfg.block_out_channels)
    for i in range(n):
        has_attn = cfg.down_block_has_attn[i]
        for j in range(cfg.layers_per_block):
            if has_attn:
                _map_resnet(sd, f"down_blocks.{i}.resnets.{j}", out,
                            f"down_{i}_{j}.resnet", prefix)
                _map_transformer2d(sd, f"down_blocks.{i}.attentions.{j}", out,
                                   f"down_{i}_{j}.attn",
                                   cfg.transformer_layers_per_block[i],
                                   cfg.use_linear_projection, prefix)
            else:
                _map_resnet(sd, f"down_blocks.{i}.resnets.{j}", out,
                            f"down_{i}_{j}_resnet", prefix)
        if i < n - 1:
            _set(out, f"down_{i}_downsample.conv.kernel",
                 _conv(sd[f"{prefix}down_blocks.{i}.downsamplers.0.conv.weight"]))
            _set(out, f"down_{i}_downsample.conv.bias",
                 sd[f"{prefix}down_blocks.{i}.downsamplers.0.conv.bias"])

    _map_resnet(sd, "mid_block.resnets.0", out, "mid_resnet_0", prefix)
    _map_transformer2d(sd, "mid_block.attentions.0", out, "mid_attn",
                       cfg.transformer_layers_per_block[-1],
                       cfg.use_linear_projection, prefix)
    _map_resnet(sd, "mid_block.resnets.1", out, "mid_resnet_1", prefix)


def convert_unet(sd: Dict[str, np.ndarray], cfg: UNetConfig) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    _map_unet_core(sd, out, cfg)
    n = len(cfg.block_out_channels)
    for k in range(n):  # diffusers up block k == our channel index i = n-1-k
        i = n - 1 - k
        has_attn = cfg.down_block_has_attn[i]
        for j in range(cfg.layers_per_block + 1):
            if has_attn:
                _map_resnet(sd, f"up_blocks.{k}.resnets.{j}", out,
                            f"up_{i}_{j}.resnet")
                _map_transformer2d(sd, f"up_blocks.{k}.attentions.{j}", out,
                                   f"up_{i}_{j}.attn",
                                   cfg.transformer_layers_per_block[i],
                                   cfg.use_linear_projection)
            else:
                _map_resnet(sd, f"up_blocks.{k}.resnets.{j}", out,
                            f"up_{i}_{j}_resnet")
        if i > 0:
            _set(out, f"up_{i}_upsample.conv.kernel",
                 _conv(sd[f"up_blocks.{k}.upsamplers.0.conv.weight"]))
            _set(out, f"up_{i}_upsample.conv.bias",
                 sd[f"up_blocks.{k}.upsamplers.0.conv.bias"])
    _set(out, "conv_norm_out.GroupNorm_0.scale", sd["conv_norm_out.weight"])
    _set(out, "conv_norm_out.GroupNorm_0.bias", sd["conv_norm_out.bias"])
    _set(out, "conv_out.kernel", _conv(sd["conv_out.weight"]))
    _set(out, "conv_out.bias", sd["conv_out.bias"])
    return out


def convert_controlnet(sd: Dict[str, np.ndarray], cfg: UNetConfig) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    _map_unet_core(sd, out, cfg)
    ce = "controlnet_cond_embedding"
    _set(out, f"{ce}.conv_in.kernel", _conv(sd[f"{ce}.conv_in.weight"]))
    _set(out, f"{ce}.conv_in.bias", sd[f"{ce}.conv_in.bias"])
    k = 0
    while f"{ce}.blocks.{k}.weight" in sd:
        _set(out, f"{ce}.blocks_{k}.kernel", _conv(sd[f"{ce}.blocks.{k}.weight"]))
        _set(out, f"{ce}.blocks_{k}.bias", sd[f"{ce}.blocks.{k}.bias"])
        k += 1
    _set(out, f"{ce}.conv_out.kernel", _conv(sd[f"{ce}.conv_out.weight"]))
    _set(out, f"{ce}.conv_out.bias", sd[f"{ce}.conv_out.bias"])
    k = 0
    while f"controlnet_down_blocks.{k}.weight" in sd:
        _set(out, f"controlnet_down_{k}.kernel",
             _conv(sd[f"controlnet_down_blocks.{k}.weight"]))
        _set(out, f"controlnet_down_{k}.bias", sd[f"controlnet_down_blocks.{k}.bias"])
        k += 1
    _set(out, "controlnet_mid.kernel", _conv(sd["controlnet_mid_block.weight"]))
    _set(out, "controlnet_mid.bias", sd["controlnet_mid_block.bias"])
    return out


def _map_vae_attention(sd, src: str, out, dst: str):
    """VAE mid attention; handles both modern (to_q) and legacy (query) names."""
    legacy = f"{src}.query.weight" in sd
    names = {"to_q": "query", "to_k": "key", "to_v": "value"} if legacy else \
            {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v"}
    gn = f"{src}.group_norm"
    _set(out, f"{dst}.group_norm.GroupNorm_0.scale", sd[f"{gn}.weight"])
    _set(out, f"{dst}.group_norm.GroupNorm_0.bias", sd[f"{gn}.bias"])
    for flax_n, torch_n in names.items():
        w = sd[f"{src}.{torch_n}.weight"]
        w = w[:, :, 0, 0] if w.ndim == 4 else w
        _set(out, f"{dst}.attn.{flax_n}.kernel", _lin(w))
        _set(out, f"{dst}.attn.{flax_n}.bias", sd[f"{src}.{torch_n}.bias"])
    o = f"{src}.proj_attn" if legacy else f"{src}.to_out.0"
    w = sd[f"{o}.weight"]
    w = w[:, :, 0, 0] if w.ndim == 4 else w
    _set(out, f"{dst}.attn.to_out.kernel", _lin(w))
    _set(out, f"{dst}.attn.to_out.bias", sd[f"{o}.bias"])


def convert_vae(sd: Dict[str, np.ndarray], cfg: VAEConfig) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    n = len(cfg.block_out_channels)
    for side in ("encoder", "decoder"):
        sub: Dict[str, Any] = {}
        _set(out, side, sub)
        pre = f"{side}."
        _set(sub, "conv_in.kernel", _conv(sd[pre + "conv_in.weight"]))
        _set(sub, "conv_in.bias", sd[pre + "conv_in.bias"])
        blocks = "down_blocks" if side == "encoder" else "up_blocks"
        layers = cfg.layers_per_block if side == "encoder" else cfg.layers_per_block + 1
        dstpre = "down" if side == "encoder" else "up"
        for i in range(n):
            for j in range(layers):
                _map_resnet(sd, f"{blocks}.{i}.resnets.{j}", sub,
                            f"{dstpre}_{i}_{j}", pre)
            if i < n - 1:
                if side == "encoder":
                    _set(sub, f"down_{i}_downsample.conv.kernel",
                         _conv(sd[f"{pre}down_blocks.{i}.downsamplers.0.conv.weight"]))
                    _set(sub, f"down_{i}_downsample.conv.bias",
                         sd[f"{pre}down_blocks.{i}.downsamplers.0.conv.bias"])
                else:
                    _set(sub, f"up_{i}_upsample.conv.kernel",
                         _conv(sd[f"{pre}up_blocks.{i}.upsamplers.0.conv.weight"]))
                    _set(sub, f"up_{i}_upsample.conv.bias",
                         sd[f"{pre}up_blocks.{i}.upsamplers.0.conv.bias"])
        _map_resnet(sd, "mid_block.resnets.0", sub, "mid_resnet_0", pre)
        _map_vae_attention(sd, f"{side}.mid_block.attentions.0", sub, "mid_attn")
        _map_resnet(sd, "mid_block.resnets.1", sub, "mid_resnet_1", pre)
        _set(sub, "conv_norm_out.GroupNorm_0.scale", sd[pre + "conv_norm_out.weight"])
        _set(sub, "conv_norm_out.GroupNorm_0.bias", sd[pre + "conv_norm_out.bias"])
        _set(sub, "conv_out.kernel", _conv(sd[pre + "conv_out.weight"]))
        _set(sub, "conv_out.bias", sd[pre + "conv_out.bias"])
    _set(out, "quant_conv.kernel", _conv(sd["quant_conv.weight"]))
    _set(out, "quant_conv.bias", sd["quant_conv.bias"])
    _set(out, "post_quant_conv.kernel", _conv(sd["post_quant_conv.weight"]))
    _set(out, "post_quant_conv.bias", sd["post_quant_conv.bias"])
    return out


def convert_clip(sd: Dict[str, np.ndarray], cfg: CLIPTextConfig) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    pre = "text_model."
    _set(out, "token_embedding.embedding",
         sd[pre + "embeddings.token_embedding.weight"])
    out["position_embedding"] = sd[pre + "embeddings.position_embedding.weight"]
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        d = f"layers_{i}"
        for a in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(out, f"{d}.{a}.kernel", _lin(sd[f"{lp}.self_attn.{a}.weight"]))
            _set(out, f"{d}.{a}.bias", sd[f"{lp}.self_attn.{a}.bias"])
        for nrm in ("layer_norm1", "layer_norm2"):
            _set(out, f"{d}.{nrm}.scale", sd[f"{lp}.{nrm}.weight"])
            _set(out, f"{d}.{nrm}.bias", sd[f"{lp}.{nrm}.bias"])
        for fc in ("fc1", "fc2"):
            _set(out, f"{d}.{fc}.kernel", _lin(sd[f"{lp}.mlp.{fc}.weight"]))
            _set(out, f"{d}.{fc}.bias", sd[f"{lp}.mlp.{fc}.bias"])
    _set(out, "final_layer_norm.scale", sd[pre + "final_layer_norm.weight"])
    _set(out, "final_layer_norm.bias", sd[pre + "final_layer_norm.bias"])
    if "text_projection.weight" in sd:
        _set(out, "text_projection.kernel", _lin(sd["text_projection.weight"]))
    return out


# ---------------------------------------------------------------------------
# Top-level conversion
# ---------------------------------------------------------------------------

_SUBDIRS = {"unet": "unet", "vae": "vae", "text_encoder_0": "text_encoder",
            "text_encoder_1": "text_encoder_2"}


def convert_checkpoint(src_dir: str, out_dir: str, bundle_cfg: ModelBundleConfig,
                       controlnet_src: Optional[str] = None):
    """Convert an HF diffusers pipeline directory into cached .npz pytrees."""
    os.makedirs(out_dir, exist_ok=True)
    for name, sub in _SUBDIRS.items():
        d = os.path.join(src_dir, sub)
        if not os.path.isdir(d):
            continue
        sd = load_state_dict(d)
        if name == "unet":
            params = convert_unet(sd, bundle_cfg.unet)
        elif name == "vae":
            params = convert_vae(sd, bundle_cfg.vae)
        else:
            idx = int(name.rsplit("_", 1)[1])
            params = convert_clip(sd, bundle_cfg.text_encoders[idx])
        save_params_npz(params, os.path.join(out_dir, f"{name}.npz"))
    if controlnet_src is not None:
        sd = load_state_dict(controlnet_src)
        params = convert_controlnet(sd, bundle_cfg.unet)
        save_params_npz(params, os.path.join(out_dir, "controlnet.npz"))


def load_converted_params(out_dir: str) -> Dict[str, Any]:
    loaded = {}
    for fname in os.listdir(out_dir):
        if fname.endswith(".npz"):
            loaded[fname[:-4]] = load_params_npz(os.path.join(out_dir, fname))
    return loaded


def validate_structure(converted: Dict[str, Any], initialized: Dict[str, Any],
                       name: str = "params"):
    """Converted tree must match the model-init tree (paths + shapes)."""
    a = _flatten(converted)
    b = _flatten(initialized)
    missing = sorted(set(map("/".join, b)) - set(map("/".join, a)))
    extra = sorted(set(map("/".join, a)) - set(map("/".join, b)))
    if missing or extra:
        raise ValueError(f"{name}: structure mismatch\n"
                         f"  missing ({len(missing)}): {missing[:8]}\n"
                         f"  extra ({len(extra)}): {extra[:8]}")
    for k in a:
        if a[k].shape != b[k].shape:
            raise ValueError(f"{name}: shape mismatch at {'/'.join(k)}: "
                             f"{a[k].shape} vs {b[k].shape}")


# ---------------------------------------------------------------------------
# DPT depth estimator (transformers DPTForDepthEstimation, non-hybrid)
# ---------------------------------------------------------------------------


def convert_dpt(sd: Dict[str, np.ndarray], cfg=None) -> Dict[str, Any]:
    """transformers DPTForDepthEstimation state dict -> models/dpt.py params.

    Covers the non-hybrid readout_type='project' family (Intel/dpt-large,
    the default of `pipeline('depth-estimation')` the reference uses at
    /root/reference/elastic_diffusion_w_controlnet.py:183).
    """
    from elasticdiffusion_tpu.models.dpt import DPT_LARGE
    cfg = cfg or DPT_LARGE
    out: Dict[str, Any] = {}
    pre = "dpt." if any(k.startswith("dpt.") for k in sd) else ""

    _set(out, "cls_token", sd[f"{pre}embeddings.cls_token"])
    _set(out, "position_embeddings", sd[f"{pre}embeddings.position_embeddings"])
    _set(out, "patch_embeddings.kernel",
         _conv(sd[f"{pre}embeddings.patch_embeddings.projection.weight"]))
    _set(out, "patch_embeddings.bias",
         sd[f"{pre}embeddings.patch_embeddings.projection.bias"])

    for i in range(cfg.num_layers):
        src = f"{pre}encoder.layer.{i}"
        dst = f"layer_{i}"
        for t_name, f_name in (("attention.attention.query", "query"),
                               ("attention.attention.key", "key"),
                               ("attention.attention.value", "value"),
                               ("attention.output.dense", "attn_out"),
                               ("intermediate.dense", "intermediate"),
                               ("output.dense", "output")):
            _set(out, f"{dst}.{f_name}.kernel", _lin(sd[f"{src}.{t_name}.weight"]))
            _set(out, f"{dst}.{f_name}.bias", sd[f"{src}.{t_name}.bias"])
        for ln in ("layernorm_before", "layernorm_after"):
            _set(out, f"{dst}.{ln}.scale", sd[f"{src}.{ln}.weight"])
            _set(out, f"{dst}.{ln}.bias", sd[f"{src}.{ln}.bias"])

    for j in range(len(cfg.neck_hidden_sizes)):
        rp = f"neck.reassemble_stage.readout_projects.{j}.0"
        _set(out, f"readout_project_{j}.kernel", _lin(sd[f"{rp}.weight"]))
        _set(out, f"readout_project_{j}.bias", sd[f"{rp}.bias"])
        rl = f"neck.reassemble_stage.layers.{j}"
        _set(out, f"reassemble_proj_{j}.kernel", _conv(sd[f"{rl}.projection.weight"]))
        _set(out, f"reassemble_proj_{j}.bias", sd[f"{rl}.projection.bias"])
        fac = cfg.reassemble_factors[j]
        if fac > 1:
            # torch ConvTranspose2d weight (I, O, kh, kw) -> flax (kh, kw, I, O)
            w = sd[f"{rl}.resize.weight"]
            _set(out, f"reassemble_resize_{j}.kernel", w.transpose(2, 3, 0, 1))
            _set(out, f"reassemble_resize_{j}.bias", sd[f"{rl}.resize.bias"])
        elif fac < 1:
            _set(out, f"reassemble_resize_{j}.kernel", _conv(sd[f"{rl}.resize.weight"]))
            _set(out, f"reassemble_resize_{j}.bias", sd[f"{rl}.resize.bias"])
        _set(out, f"neck_conv_{j}.kernel", _conv(sd[f"neck.convs.{j}.weight"]))

        fl = f"neck.fusion_stage.layers.{j}"
        _set(out, f"fusion_{j}.projection.kernel", _conv(sd[f"{fl}.projection.weight"]))
        _set(out, f"fusion_{j}.projection.bias", sd[f"{fl}.projection.bias"])
        layers = ("residual_layer2",) if j == 0 else ("residual_layer1",
                                                      "residual_layer2")
        for rn in layers:  # fusion_0 never calls residual_layer1 (no skip input)
            for cn in ("convolution1", "convolution2"):
                _set(out, f"fusion_{j}.{rn}.{cn}.kernel",
                     _conv(sd[f"{fl}.{rn}.{cn}.weight"]))
                _set(out, f"fusion_{j}.{rn}.{cn}.bias", sd[f"{fl}.{rn}.{cn}.bias"])

    for t_idx, f_name in ((0, "head_conv1"), (2, "head_conv2"), (4, "head_conv3")):
        _set(out, f"{f_name}.kernel", _conv(sd[f"head.head.{t_idx}.weight"]))
        _set(out, f"{f_name}.bias", sd[f"head.head.{t_idx}.bias"])
    return out


# ---------------------------------------------------------------------------
# CLI: python -m elasticdiffusion_tpu.models.convert SRC OUT --sd_version ...
# ---------------------------------------------------------------------------


def _eval_shape_trees(bundle_cfg: ModelBundleConfig):
    """Shape-only init trees (no compute) for structure validation."""
    import jax
    import jax.numpy as jnp
    from elasticdiffusion_tpu.models.clip import CLIPTextModel
    from elasticdiffusion_tpu.models.unet import UNet2DCondition
    from elasticdiffusion_tpu.models.vae import AutoencoderKL

    out = {}
    rng = jax.random.PRNGKey(0)
    u = UNet2DCondition(bundle_cfg.unet)
    s = bundle_cfg.unet.sample_size
    kw = {}
    if bundle_cfg.unet.addition_embed_type == "text_time":
        kw = {"added_text_embeds":
              jnp.zeros((1, bundle_cfg.unet.pooled_projection_dim)),
              "added_time_ids": jnp.zeros((1, 6))}
    out["unet"] = jax.eval_shape(
        u.init, rng, jnp.zeros((1, bundle_cfg.unet.in_channels, s, s)),
        jnp.zeros((1,)),
        jnp.zeros((1, 77, bundle_cfg.unet.cross_attention_dim)),
        **kw)["params"]
    v = AutoencoderKL(bundle_cfg.vae)
    sv = 8 * bundle_cfg.vae.scale_factor
    out["vae"] = jax.eval_shape(
        v.init, rng, jnp.zeros((1, 3, sv, sv)),
        jnp.zeros((1, bundle_cfg.vae.latent_channels, 8, 8)))["params"]
    for i, tc in enumerate(bundle_cfg.text_encoders):
        m = CLIPTextModel(tc)
        out[f"text_encoder_{i}"] = jax.eval_shape(
            m.init, rng,
            jnp.zeros((1, tc.max_position_embeddings), jnp.int32))["params"]
    return out


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="Convert an HF diffusers checkpoint directory (the "
                    "same checkpoints the reference loads from the hub, "
                    "/root/reference/elastic_diffusion.py:144-153) into "
                    "this framework's cached .npz pytrees.")
    p.add_argument("src", help="HF pipeline directory (with unet/, vae/, ...)")
    p.add_argument("out", help="output directory for the converted .npz files")
    p.add_argument("--sd_version", default="XL1.0")
    p.add_argument("--controlnet", default=None,
                   help="optional ControlNet model directory")
    p.add_argument("--dpt", default=None,
                   help="optional DPT depth-estimator directory "
                        "(Intel/dpt-large layout)")
    p.add_argument("--validate", action="store_true",
                   help="check converted trees against the model init "
                        "structure (shape-only, no compute)")
    opt = p.parse_args(argv)

    cfg = get_bundle_config(opt.sd_version)
    convert_checkpoint(opt.src, opt.out, cfg, controlnet_src=opt.controlnet)
    if opt.dpt:
        sd = load_state_dict(opt.dpt)
        save_params_npz(convert_dpt(sd), os.path.join(opt.out, "dpt.npz"))
    if opt.validate:
        want = _eval_shape_trees(cfg)
        got = load_converted_params(opt.out)
        for name, tree in want.items():
            if name in got:
                validate_structure(got[name], tree, name=name)
                print(f"[convert] {name}: structure ok")
    print(f"[convert] wrote {sorted(os.listdir(opt.out))} -> {opt.out}")


if __name__ == "__main__":
    main()
