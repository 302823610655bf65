"""Benchmark: sec/image, SDXL-architecture ElasticDiffusion 1024x2048 @ 50
steps on one chip (BASELINE.md tracked metric).

Prints ONE JSON line:
  {"metric": ..., "value": sec_per_image, "unit": "s",
   "vs_baseline": north_star_chip_seconds / measured_chip_seconds, ...}

vs_baseline is measured against the BASELINE.json north star (SDXL 1024x2048,
50 steps, <20 s on v5e-8 == 160 chip-seconds/image): >= 1.0 means the
north-star per-chip budget is met. The reference publishes no numbers
(BASELINE.md), so this derived target is the tracked bar.

Weights are random-init (zero-egress environment); the compute graph —
and therefore the performance — is identical to converted checkpoints.

Env knobs: ED_BENCH_PRESET=sdxl|sd15 (default sdxl), ED_BENCH_STEPS=N
measured steps (default 2), ED_BENCH_RS resampling steps (default 7).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.entry import make_denoise_step
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    from elasticdiffusion_tpu.models.registry import load_bundle

    preset = os.environ.get("ED_BENCH_PRESET", "sdxl")
    n_measure = int(os.environ.get("ED_BENCH_STEPS", "2"))
    rs = int(os.environ.get("ED_BENCH_RS", "7"))

    on_tpu = jax.default_backend() not in ("cpu",)
    runtime = RuntimeConfig(
        param_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas="auto")

    if preset == "sdxl" and on_tpu:
        sd_version, height, width = "XL1.0", 1024, 2048
    elif preset == "sd15" and on_tpu:
        sd_version, height, width = "1.5", 512, 768
    else:
        # CPU smoke: tiny graph, same code path
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(__file__),
                                        "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        pipe = mod._build_pipe()
        height = width = 2 * pipe.bundle.config.native_resolution
        sd_version = "entry-sd"

    num_steps = 50
    if sd_version != "entry-sd":
        bundle = load_bundle(sd_version, runtime=runtime)
        pipe = ElasticDiffusion(bundle=bundle, runtime=runtime)

    step_fn, (lat, key, inp), view_plan = make_denoise_step(
        pipe, height, width, num_inference_steps=num_steps,
        resampling_steps=rs, repaint=True)
    step = jax.jit(step_fn)

    # warmup/compile
    t0 = time.time()
    out, key, _ = step(lat, key, inp)
    out.block_until_ready()
    compile_s = time.time() - t0

    times = []
    for _ in range(n_measure):
        t0 = time.time()
        out, key, _ = step(out, key, inp)
        out.block_until_ready()
        times.append(time.time() - t0)
    step_s = min(times)

    V = view_plan.num_views
    fwd_per_step = 2 * (rs + 1) + V + 2 + V  # repaint on (SURVEY §3.1)
    sec_per_image = step_s * num_steps
    fwd_per_sec = fwd_per_step / step_s

    north_star_chip_seconds = 20.0 * 8  # <20 s on v5e-8
    result = {
        "metric": "sec/image SDXL 1024x2048 @50 steps per chip; "
                  "UNet view-forwards/sec",
        "value": round(sec_per_image, 3),
        "unit": "s",
        "vs_baseline": round(north_star_chip_seconds / max(sec_per_image, 1e-9), 4),
        "unet_view_forwards_per_sec": round(fwd_per_sec, 3),
        "views": V,
        "fwd_per_step": fwd_per_step,
        "step_seconds": round(step_s, 4),
        "compile_seconds": round(compile_s, 1),
        "preset": f"{sd_version}@{height}x{width}",
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
