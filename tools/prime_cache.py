"""Prime the persistent compilation cache with the scan-on SDXL chain.

RuntimeConfig.scan_depth='on' is the measured steady-state winner
(0.0587 vs 0.0611 s/fwd, artifacts/SCAN_COMPILE_AB.json) but compiles 3.5x
slower cold. This tool pays that compile ONCE into the persistent cache
(proven to hit across processes: artifacts/CACHE_CROSSPROC.json), then
drops the marker that makes scan_depth='auto' resolve to ON for this model
topology on this host (utils/cache.scan_primed). Run it at deploy time;
every later process — bench, CLI, server — gets the fast chain with a warm
cold-start.

Primes the flagship signature (SDXL 1024x2048, rs=7, repaint) — the same
one bench.py and the Gradio example table hit — plus the halo decode.
Env: ED_PRIME_PRESET=sdxl (default), ED_PRIME_H/W/RS to override.
ED_PRIME_CONTROLNET=canny primes the ControlNet chain variant instead
(default vbs=8 chunking, override with ED_PRIME_VBS) — its warm start
runs in AOT mode (core/segmented.py _warm_mode), which pays compiles
straight into the persistent cache without touching HBM, exactly what a
CN deployment needs (artifacts/CN_FLAGSHIP_r05.json).

Writes artifacts/PRIME_CACHE.json with the wall-clock it paid.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from elasticdiffusion_tpu.utils.cache import (
        enable_compilation_cache, mark_scan_primed,
    )
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.entry import make_denoise_step
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    from elasticdiffusion_tpu.models.registry import load_bundle

    height = int(os.environ.get("ED_PRIME_H", "1024"))
    width = int(os.environ.get("ED_PRIME_W", "2048"))
    rs = int(os.environ.get("ED_PRIME_RS", "7"))
    cn = os.environ.get("ED_PRIME_CONTROLNET") or None
    vbs = int(os.environ.get("ED_PRIME_VBS", "8" if cn else "0"))
    on_tpu = jax.default_backend() not in ("cpu",)
    runtime = RuntimeConfig(
        param_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        scan_depth="on", view_batch_size=vbs)

    t_all = time.time()
    bundle = load_bundle("XL1.0", runtime=runtime, controlnet_model=cn)
    pipe = ElasticDiffusion(bundle=bundle, runtime=runtime)
    step_kw = {}
    if cn is not None:
        dh, dw = pipe.get_downsample_size(height, width)
        vsf_c = pipe.vae_scale_factor
        step_kw = dict(
            controlnet_cond=jax.random.uniform(
                jax.random.PRNGKey(11), (1, 3, dh * vsf_c, dw * vsf_c),
                jnp.float32),
            controlnet_scale=0.5)
    # decode FIRST, while HBM is at its emptiest: the fp32 streamed decode
    # at the flagship resolutions needs several GB of temporaries, and with
    # ControlNet resident (~2.3 GB extra weights) it OOMs if the step's
    # conditioning/latent buffers are already live (round-5 CN prime)
    t0 = time.time()
    vsf = pipe.vae_scale_factor
    lat_dec = jax.random.normal(jax.random.PRNGKey(7),
                                (1, 4, height // vsf, width // vsf),
                                jnp.float32)
    img = pipe.halo_decode(lat_dec)
    jax.device_get(img.reshape(-1)[0])
    del img, lat_dec
    dec_s = time.time() - t0
    print(f"[prime] decode: {dec_s:.0f}s", file=sys.stderr, flush=True)

    step_fn, (lat, key, inp), _ = make_denoise_step(
        pipe, height, width, num_inference_steps=50, resampling_steps=rs,
        repaint=True, segmented=True, **step_kw)

    t0 = time.time()
    n = step_fn.warm_start(inp)
    warm_s = time.time() - t0
    print(f"[prime] warm_start: {n} programs in {warm_s:.0f}s",
          file=sys.stderr, flush=True)

    # one real step: catches anything warm_start missed (and proves the
    # warmed programs execute)
    t0 = time.time()
    out, key, _ = step_fn(lat, key, inp)
    jax.device_get(out.reshape(-1)[0])
    first_s = time.time() - t0
    print(f"[prime] first step: {first_s:.0f}s", file=sys.stderr, flush=True)

    marker = None
    if cn is None:
        # the marker promises the scan-on TEXT2IMG chain is cached; the CN
        # variant compiles different programs (residual operands), so a
        # CN-only prime must not flip scan_depth='auto' on for text2img
        marker = mark_scan_primed(
            bundle.config.unet, runtime.param_dtype,
            note=f"primed {height}x{width} rs={rs} warm={warm_s:.0f}s")
    total = time.time() - t_all
    result = {"preset": f"XL1.0@{height}x{width}", "rs": rs,
              "controlnet": cn, "view_batch_size": vbs,
              "programs_warmed": n,
              "warm_start_s": round(warm_s, 1),
              "first_step_s": round(first_s, 1),
              "decode_cold_s": round(dec_s, 1),
              "total_s": round(total, 1),
              "marker": marker,
              "backend": jax.default_backend()}
    os.makedirs("artifacts", exist_ok=True)
    out_name = "PRIME_CACHE_CN.json" if cn else "PRIME_CACHE.json"
    with open(f"artifacts/{out_name}", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
