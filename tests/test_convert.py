"""Checkpoint-converter structure tests: converted trees must exactly match
model-init trees for every real config (via eval_shape — no big allocations),
and weight transforms must land values in the right place."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torch_layouts
from toy_configs import TOY_CLIP_2, TOY_UNET, TOY_UNET_XL, TOY_VAE

from elasticdiffusion_tpu.configs import (
    CLIP_VIT_BIGG_14, CLIP_VIT_H_14, CLIP_VIT_L_14, ControlNetConfig,
    UNET_SD1, UNET_SD2, UNET_SDXL, VAEConfig,
)
from elasticdiffusion_tpu.models import convert
from elasticdiffusion_tpu.models.clip import CLIPTextModel
from elasticdiffusion_tpu.models.controlnet import ControlNet
from elasticdiffusion_tpu.models.unet import UNet2DCondition
from elasticdiffusion_tpu.models.vae import AutoencoderKL


def _unet_init_shapes(cfg):
    m = UNet2DCondition(cfg)
    s = 8
    kwargs = {}
    if cfg.addition_embed_type == "text_time":
        kwargs = {"added_text_embeds": jnp.zeros((1, cfg.pooled_projection_dim)),
                  "added_time_ids": jnp.zeros((1, 6))}
    shapes = jax.eval_shape(
        m.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, s, s)), jnp.zeros((1,)),
        jnp.zeros((1, 77, cfg.cross_attention_dim)), **kwargs)
    return shapes["params"]


@pytest.mark.parametrize("cfg", [TOY_UNET, TOY_UNET_XL, UNET_SD1, UNET_SD2,
                                 UNET_SDXL],
                         ids=["toy", "toy-xl", "sd1", "sd2", "sdxl"])
def test_unet_conversion_structure(cfg):
    sd = torch_layouts.unet_state_dict(cfg)
    params = convert.convert_unet(sd, cfg)
    convert.validate_structure(params, _unet_init_shapes(cfg), "unet")


@pytest.mark.parametrize("cfg,legacy", [(TOY_VAE, False), (VAEConfig(), False),
                                        (VAEConfig(), True)],
                         ids=["toy", "sd", "sd-legacy-attn"])
def test_vae_conversion_structure(cfg, legacy):
    sd = torch_layouts.vae_state_dict(cfg, legacy_attn=legacy)
    params = convert.convert_vae(sd, cfg)
    m = AutoencoderKL(cfg)
    shapes = jax.eval_shape(
        m.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, 8 * cfg.scale_factor, 8 * cfg.scale_factor)),
        jnp.zeros((1, cfg.latent_channels, 8, 8)))
    convert.validate_structure(params, shapes["params"], "vae")


@pytest.mark.parametrize("cfg", [TOY_CLIP_2, CLIP_VIT_L_14, CLIP_VIT_H_14,
                                 CLIP_VIT_BIGG_14],
                         ids=["toy2", "vit-l", "vit-h", "vit-bigg"])
def test_clip_conversion_structure(cfg):
    sd = torch_layouts.clip_state_dict(cfg)
    params = convert.convert_clip(sd, cfg)
    m = CLIPTextModel(cfg)
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 77), jnp.int32))
    convert.validate_structure(params, shapes["params"], "clip")


@pytest.mark.parametrize("ucfg", [UNET_SD1, UNET_SDXL], ids=["sd1", "sdxl"])
def test_controlnet_conversion_structure(ucfg):
    cfg = ControlNetConfig(unet=ucfg)
    sd = torch_layouts.controlnet_state_dict(ucfg)
    params = convert.convert_controlnet(sd, ucfg)
    m = ControlNet(cfg)
    s = 8
    kwargs = {}
    if ucfg.addition_embed_type == "text_time":
        kwargs = {"added_text_embeds": jnp.zeros((1, ucfg.pooled_projection_dim)),
                  "added_time_ids": jnp.zeros((1, 6))}
    shapes = jax.eval_shape(
        m.init, jax.random.PRNGKey(0),
        jnp.zeros((1, ucfg.in_channels, s, s)), jnp.zeros((1,)),
        jnp.zeros((1, 77, ucfg.cross_attention_dim)),
        jnp.zeros((1, 3, s * 8, s * 8)), **kwargs)
    convert.validate_structure(params, shapes["params"], "controlnet")


def test_weight_transforms_land_correctly():
    """Converted values must flow through the flax model identically to the
    torch semantics: conv kernel transpose + dense transpose spot checks."""
    cfg = TOY_UNET
    sd = torch_layouts.unet_state_dict(cfg)
    w = np.arange(cfg.block_out_channels[0] * cfg.in_channels * 9,
                  dtype=np.float32).reshape(cfg.block_out_channels[0],
                                            cfg.in_channels, 3, 3)
    sd["conv_in.weight"] = w
    params = convert.convert_unet(sd, cfg)
    # flax kernel is (kh, kw, I, O)
    np.testing.assert_array_equal(params["conv_in"]["kernel"],
                                  np.transpose(w, (2, 3, 1, 0)))
    lin = sd["time_embedding.linear_1.weight"]
    assert params["time_embedding"]["linear_1"]["kernel"].shape == lin.T.shape


def test_npz_roundtrip(tmp_path):
    cfg = TOY_UNET
    sd = torch_layouts.unet_state_dict(cfg)
    for k in sd:
        sd[k] = np.random.default_rng(0).standard_normal(sd[k].shape).astype(np.float32)
    params = convert.convert_unet(sd, cfg)
    path = str(tmp_path / "unet.npz")
    convert.save_params_npz(params, path)
    loaded = convert.load_params_npz(path)
    flat_a = convert._flatten(params)
    flat_b = convert._flatten(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_convert_cli_end_to_end(tmp_path, monkeypatch):
    """`python -m elasticdiffusion_tpu.models.convert SRC OUT --validate`
    over a synthetic HF-layout checkpoint directory (toy sizes)."""
    import torch
    from elasticdiffusion_tpu.models import convert as C
    from toy_configs import toy_bundle_config
    cfg = toy_bundle_config()
    src = tmp_path / "src"
    for sub, sd in (("unet", torch_layouts.unet_state_dict(cfg.unet)),
                    ("vae", torch_layouts.vae_state_dict(cfg.vae)),
                    ("text_encoder",
                     torch_layouts.clip_state_dict(cfg.text_encoders[0]))):
        d = src / sub
        d.mkdir(parents=True)
        torch.save({k: torch.from_numpy(np.asarray(v))
                    for k, v in sd.items()}, d / "pytorch_model.bin")
    out = tmp_path / "out"
    monkeypatch.setattr(C, "get_bundle_config", lambda v: cfg)
    C.main([str(src), str(out), "--sd_version", "toy", "--validate"])
    names = sorted(f.name for f in out.iterdir())
    assert names == ["text_encoder_0.npz", "unet.npz", "vae.npz"]
