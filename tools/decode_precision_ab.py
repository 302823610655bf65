"""Decode matmul-precision A/B at production resolutions (VERDICT r4 #4).

Question: the fp32 VAE decode runs its matmuls at 'high' (3-pass bf16) by
default and measures 3x its roofline floor (1.02 s at 1024x2048,
BENCH_r04). Is 'default' (1-pass bf16 on fp32 activations) accurate enough
to ship? force_upcast exists for RANGE (fp16 overflow -> black images,
/root/reference/elastic_diffusion.py:178-195); bf16 carries the same
8-bit exponent as fp32, so range safety is unaffected by the pass count —
only mantissa precision is at stake, and the displayed image quantizes to
uint8 anyway.

Method: full production halo_decode (streamed stage B at these sizes) of
the REAL XL-VAE architecture at 1024x2048 and 2048x2048, at matmul
precisions 'default' / 'high' / 'highest'. 'highest' (6-pass, ~fp32-exact)
is the oracle. Accuracy bound: max|img_p - img_highest| vs one uint8
quantization step of the [-1,1] output range (2/255): deviations below
HALF a step cannot change any pixel by more than one level.

Writes artifacts/DECODE_PRECISION_AB.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _toy_xlvae_bundle():
    """Real XL VAE (full width, force_upcast) + toy UNet/text so init is
    fast — halo_decode touches only the VAE."""
    from elasticdiffusion_tpu.configs import (
        CLIPTextConfig, ModelBundleConfig, RuntimeConfig, UNetConfig,
        VAEConfig, get_bundle_config,
    )
    xl = get_bundle_config("XL1.0")
    unet = UNetConfig(sample_size=16, block_out_channels=(32, 64, 64),
                      down_block_has_attn=(True, True, False),
                      layers_per_block=1,
                      transformer_layers_per_block=(1, 1, 1),
                      cross_attention_dim=64, attention_head_dim=(4, 4, 4))
    clip = CLIPTextConfig(vocab_size=1024, hidden_size=64, num_layers=2,
                          num_heads=4, intermediate_size=128)
    return dataclasses.replace(xl, unet=unet, text_encoders=(clip,),
                               min_latent_size=16)


def main():
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    from elasticdiffusion_tpu.models.registry import load_bundle

    assert jax.default_backend() not in ("cpu",), "A/B needs the TPU backend"
    cfg = _toy_xlvae_bundle()
    runtime = RuntimeConfig()
    bundle = load_bundle(cfg.sd_version, runtime=runtime, bundle_config=cfg)
    assert bundle.config.vae.force_upcast

    shapes = [(1, 4, 128, 256), (1, 4, 256, 256)]  # 1024x2048, 2048x2048
    precisions = ("highest", "high", "default")
    result = {"backend": jax.default_backend(), "cases": []}
    for shp in shapes:
        lat = jax.random.normal(jax.random.PRNGKey(7), shp,
                                jnp.float32) * 0.7
        case = {"latent_shape": list(shp),
                "image_px": f"{shp[2]*8}x{shp[3]*8}"}
        outs = {}
        for prec in precisions:
            b = dataclasses.replace(
                bundle, runtime=dataclasses.replace(
                    bundle.runtime, vae_matmul_precision=prec))
            pipe = ElasticDiffusion(bundle=b, runtime=b.runtime)
            img = pipe.halo_decode(lat)
            jax.device_get(img.reshape(-1)[0])  # compile+settle
            t0 = time.time()
            img = pipe.halo_decode(lat)
            jax.device_get(img.reshape(-1)[0])
            warm = time.time() - t0
            outs[prec] = np.asarray(img, np.float32)
            case[f"seconds_{prec}"] = round(warm, 3)
            print(f"[ab] {case['image_px']} {prec}: {warm:.3f}s",
                  file=sys.stderr, flush=True)
        uint8_step = 2.0 / 255.0  # one quantization level of [-1,1]
        for prec in ("high", "default"):
            d = float(np.abs(outs[prec] - outs["highest"]).max())
            case[f"maxdev_{prec}_vs_highest"] = round(d, 6)
            case[f"maxdev_{prec}_in_uint8_steps"] = round(d / uint8_step, 3)
        result["cases"].append(case)
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/DECODE_PRECISION_AB.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
