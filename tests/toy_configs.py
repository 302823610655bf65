"""Tiny model configs for CPU tests: same graph topology as SD, micro sizes."""

from elasticdiffusion_tpu.configs import (
    CLIPTextConfig, ModelBundleConfig, RuntimeConfig, UNetConfig, VAEConfig,
)
import jax.numpy as jnp

TOY_CLIP = CLIPTextConfig(vocab_size=256, hidden_size=16, num_layers=2,
                          num_heads=2, intermediate_size=32,
                          max_position_embeddings=77, hidden_act="quick_gelu")
TOY_CLIP_2 = CLIPTextConfig(vocab_size=256, hidden_size=24, num_layers=2,
                            num_heads=2, intermediate_size=48,
                            max_position_embeddings=77, hidden_act="gelu",
                            projection_dim=24)

# SD1-like: 2 blocks (attn, plain), latent 4ch, sample 8
TOY_UNET = UNetConfig(sample_size=8, block_out_channels=(8, 16),
                      down_block_has_attn=(True, False), layers_per_block=1,
                      transformer_layers_per_block=(1, 1),
                      cross_attention_dim=16, attention_head_dim=(2, 2),
                      use_linear_projection=False)

# XL-like: text_time micro-conditioning
TOY_UNET_XL = UNetConfig(sample_size=8, block_out_channels=(8, 16),
                         down_block_has_attn=(False, True), layers_per_block=1,
                         transformer_layers_per_block=(1, 2),
                         cross_attention_dim=16 + 24,
                         attention_head_dim=(2, 2), use_linear_projection=True,
                         addition_embed_type="text_time",
                         addition_time_embed_dim=4,
                         projection_class_embeddings_input_dim=24 + 6 * 4,
                         pooled_projection_dim=24)

# VAE: 2 blocks -> scale factor 2
TOY_VAE = VAEConfig(block_out_channels=(4, 8), layers_per_block=1,
                    norm_num_groups=4, scaling_factor=0.18215, sample_size=16)

TOY_RUNTIME = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                            use_pallas="off")


def toy_bundle_config(xl: bool = False) -> ModelBundleConfig:
    if xl:
        return ModelBundleConfig(
            sd_version="toy-xl", model_key="toy-xl", unet=TOY_UNET_XL,
            vae=TOY_VAE, text_encoders=(TOY_CLIP, TOY_CLIP_2), is_xl=True,
            native_resolution=16, min_latent_size=8)
    return ModelBundleConfig(
        sd_version="toy", model_key="toy", unet=TOY_UNET, vae=TOY_VAE,
        text_encoders=(TOY_CLIP,), is_xl=False, native_resolution=16,
        min_latent_size=8)


def make_toy_bundle(xl: bool = False, controlnet: str | None = None,
                    runtime: RuntimeConfig = TOY_RUNTIME):
    from elasticdiffusion_tpu.models.registry import load_bundle
    cfg = toy_bundle_config(xl)
    return load_bundle(cfg.sd_version, runtime=runtime,
                       controlnet_model=controlnet, bundle_config=cfg)
