"""Probe HBM occupancy of the XL + ControlNet estimate path.

The ControlNet flagship e2e (2048x2048 rs=10, vbs=8 chunking) OOMs in the
FIRST chunked UNet segment call even though weights are ~9.1 GB
(unet 4.78 + cn 2.33 + text 1.52 + vae 0.16 bf16 + 0.31 fp32 masters)
against a ~16 GB chip. This isolates the pieces: bundle residency, one
ControlNet forward, one segmented UNet forward with residuals, then the
full pipeline attempt — printing allocator stats after each.

Env: ED_PROBE_BATCH (default 8), ED_PROBE_FULL (0/1: run generate_image
at the flagship config afterward), ED_PROBE_H/W, ED_PROBE_VBS.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def stats(tag):
    s = jax.local_devices()[0].memory_stats() or {}
    gb = 1024 ** 3
    print(f"[mem] {tag}: in_use={s.get('bytes_in_use', 0)/gb:.2f}GB "
          f"peak={s.get('peak_bytes_in_use', 0)/gb:.2f}GB "
          f"limit={s.get('bytes_limit', 0)/gb:.2f}GB", flush=True)


def main():
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    batch = int(os.environ.get("ED_PROBE_BATCH", "8"))
    full = os.environ.get("ED_PROBE_FULL", "0") == "1"
    H = int(os.environ.get("ED_PROBE_H", "2048"))
    W = int(os.environ.get("ED_PROBE_W", "2048"))
    vbs = int(os.environ.get("ED_PROBE_VBS", "8"))

    stats("startup")
    runtime = RuntimeConfig(param_dtype=jnp.bfloat16,
                            compute_dtype=jnp.bfloat16, use_pallas="auto")
    pipe = ElasticDiffusion(sd_version="XL1.0", runtime=runtime,
                            controlnet_model="canny")
    pipe.view_batch_size = vbs
    stats("bundle loaded (unet+cn+text+vae)")

    b = pipe.bundle
    s = b.sample_size
    cd = runtime.compute_dtype
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 4, s, s), np.float32),
                    dtype=cd)
    ctx = jnp.asarray(rng.standard_normal((batch, 77, 2048), np.float32),
                      dtype=cd)
    pooled = jnp.asarray(rng.standard_normal((batch, 1280), np.float32))
    tids = jnp.tile(jnp.asarray([[H, W, 0, 0, H, W]], jnp.float32),
                    (batch, 1))
    cond = jnp.asarray(rng.random((batch, 3, s * 8, s * 8), np.float32),
                       dtype=cd)
    t = jnp.asarray([500.0])

    t0 = time.time()
    down, mid = b.apply_controlnet(x, t, ctx, cond, jnp.float32(0.5),
                                   added_text_embeds=pooled,
                                   added_time_ids=tids)
    jax.device_get(jnp.ravel(mid)[0])
    print(f"[cn fwd] batch={batch} {time.time()-t0:.1f}s "
          f"(residuals: {len(down)} down + mid)", flush=True)
    stats("after controlnet forward")

    t0 = time.time()
    eps = b.apply_unet_segmented(x, t, ctx, added_text_embeds=pooled,
                                 added_time_ids=tids,
                                 down_block_residuals=down,
                                 mid_block_residual=mid)
    jax.device_get(jnp.ravel(eps)[0])
    print(f"[unet+res] batch={batch} {time.time()-t0:.1f}s", flush=True)
    stats("after unet segmented with residuals")

    if not full:
        return

    # free the standalone-phase device buffers (~1 GB: residuals + eps)
    # before the full attempt — otherwise the probe itself shrinks the
    # pipeline's headroom and mis-reports the flagship as OOM
    del x, ctx, pooled, tids, cond, down, mid, eps

    from PIL import Image
    from elasticdiffusion_tpu.apps.preprocessors import (
        prepare_image, process_condition_image)
    dh, dw = pipe.get_downsample_size(H, W)
    vsf = pipe.vae_scale_factor
    yy, xx = np.mgrid[0:dh * vsf, 0:dw * vsf].astype(np.float32)
    synth = np.stack([127 + 120 * np.sin(xx / 17.0),
                      255 * ((xx // 64 + yy // 64) % 2),
                      np.clip(xx + yy, 0, 255)], axis=-1).astype(np.uint8)
    c = process_condition_image(Image.fromarray(synth), "canny")
    cond_low = prepare_image(c, dw * vsf, dh * vsf, batch_size=1)
    pipe.seed_everything(0)
    try:
        t0 = time.time()
        arr, info = pipe.generate_image(
            "probe", height=H, width=W,
            num_inference_steps=int(os.environ.get("ED_PROBE_STEPS", "2")),
            guidance_scale=10.0, resampling_steps=10, new_p=0.3,
            rrg_init_weight=2000, rrg_stop_t=0.4, repaint_sampling=True,
            tiled_decoder=True, return_arrays=True, condition_image=cond_low)
        print(f"[full] 1-step generate ok ({time.time()-t0:.0f}s)",
              flush=True)
        out = os.environ.get("ED_PROBE_SAVE")
        if out:
            a = np.asarray(arr)
            if a.ndim == 4:
                a = a[0]
            if a.shape[0] in (1, 3):  # NCHW -> HWC
                a = np.moveaxis(a, 0, -1)
            Image.fromarray(
                np.clip(a * 255, 0, 255).astype(np.uint8)).save(out)
            print(f"[full] saved {out}", flush=True)
        if pipe.last_metrics:
            print(f"[full] metrics: {pipe.last_metrics}", flush=True)
        # steady-state per-prompt cost: a second generate in the same
        # process reuses the cached step builder, compiled programs,
        # background-table program and the text-encoder host copy — this
        # is the number a serving process pays per image
        for rep in range(int(os.environ.get("ED_PROBE_REPEAT", "0"))):
            t0 = time.time()
            pipe.seed_everything(rep + 1)
            arr, info = pipe.generate_image(
                "probe repeat", height=H, width=W,
                num_inference_steps=int(os.environ.get("ED_PROBE_STEPS",
                                                       "2")),
                guidance_scale=10.0, resampling_steps=10, new_p=0.3,
                rrg_init_weight=2000, rrg_stop_t=0.4,
                repaint_sampling=True, tiled_decoder=True,
                return_arrays=True, condition_image=cond_low)
            print(f"[repeat {rep}] generate {time.time()-t0:.0f}s; "
                  f"metrics: {pipe.last_metrics}", flush=True)
    except Exception:
        traceback.print_exc()
    stats("after full pipeline attempt")


if __name__ == "__main__":
    main()
