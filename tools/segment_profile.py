"""Per-block UNet timing on the real chip: where does a native-resolution
forward spend its time?

Times each segment of the segmented UNet chain (stem / down_i / mid /
up_i / out) with device syncs, at the two production batch shapes of the
SDXL 1024x2048 step (direction batch 2*(rs+1)=16, views batch V=4).
This is the profiling substrate for kernel work — the per-segment split
says which blocks to attack (e.g. pallas fusions in the widest
transformer stacks). Writes artifacts/SEGMENT_PROFILE.json.

Run: python tools/segment_profile.py          (needs the TPU backend)
Env: ED_PROF_BATCHES="16,4"  ED_PROF_REPS=3
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.models.registry import load_bundle
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    batches = [int(x) for x in
               os.environ.get("ED_PROF_BATCHES", "16,4").split(",")]
    reps = int(os.environ.get("ED_PROF_REPS", "3"))
    runtime = RuntimeConfig(
        param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        use_pallas="auto",
        segment_merge_core=os.environ.get("ED_SEGMENT_MERGE_CORE", "off"))
    b = load_bundle("XL1.0", runtime=runtime)
    s = b.sample_size
    result = {"backend": jax.default_backend(), "sample_size": s,
              "per_batch": {}}
    for bs in batches:
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (bs, b.in_channels, s, s), jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(1),
                                (bs, 77, b.config.unet.cross_attention_dim),
                                jnp.bfloat16)
        pooled = jnp.zeros((bs, b.config.unet.pooled_projection_dim))
        tids = jnp.zeros((bs, 6))
        kw = dict(added_text_embeds=pooled, added_time_ids=tids)
        # warm (compile)
        t0 = time.time()
        out = b.apply_unet_segmented(x, jnp.float32(500.0), ctx, **kw)
        jax.device_get(out.reshape(-1)[0])
        compile_s = time.time() - t0
        # per-probe fetch roundtrip: every stage sync pays one ~35 ms tunnel
        # RPC (slope-calibrated in artifacts/RATE_PROBE2.json fixed_ms);
        # uncorrected it inflated r3's per-stage rates by ~20-40%
        ready = jnp.zeros((1,))
        float(ready[0])
        t0 = time.time()
        for _ in range(4):
            float(ready[0])
        roundtrip = (time.time() - t0) / 4
        best = None
        for _ in range(reps):
            timings = {}
            t0 = time.time()
            b.apply_unet_segmented(x, jnp.float32(500.0), ctx,
                                   timings=timings, **kw)
            total = time.time() - t0
            if best is None or total < best[0]:
                best = (total, timings)
        total, timings = best
        timings = {k: max(v - roundtrip, 1e-9) for k, v in timings.items()}
        total = max(total - roundtrip * len(timings), 1e-9)

        # achieved MXU rate + roofline floor per stage (utils/flops.py;
        # v5e peaks ~197 bf16 TFLOP/s, ~819 GB/s HBM): compute-bound stages
        # are kernel targets, hbm-bound ones are fusion/layout targets
        from elasticdiffusion_tpu.utils.flops import (
            roofline_seconds, unet_stage_costs,
        )
        sc = unet_stage_costs(b.config.unet, s, s)
        n_blocks = len(b.config.unet.block_out_channels)

        def _merge(keys):
            return {f: sum(sc[k][f] for k in keys) for f in sc["stem"]}

        for k in range(n_blocks):
            sc[f"front_{k}"] = _merge(["stem"] +
                                      [f"down_{i}" for i in range(k + 1)])
            sc[f"tail_{k}"] = _merge(["out"] +
                                     [f"up_{i}" for i in range(k + 1)])
            deep = [f"down_{i}" for i in range(k + 1, n_blocks)] + ["mid"]
            sc[f"downmid_{k}"] = _merge(deep)
            sc[f"core_{k}"] = _merge(
                deep + [f"up_{i}" for i in range(k + 1, n_blocks)])
        stage_tflops = {
            k: round(bs * sc[k]["flops"] / v / 1e12, 1)
            for k, v in timings.items() if k in sc and v > 0}
        stage_floor = {
            k: {"floor_ms": round(r["floor_s"] * 1e3, 1), "bound": r["bound"],
                "measured_over_floor": round(timings[k] / r["floor_s"], 2)}
            for k, r in ((k, roofline_seconds(sc[k], bs))
                         for k in timings if k in sc)}
        fwd_tflops = sum(sc[k]["flops"] for k in
                         ("stem", "mid", "out",
                          *(f"down_{i}" for i in range(n_blocks)),
                          *(f"up_{i}" for i in range(n_blocks)))) / 1e12

        result["per_batch"][str(bs)] = {
            "probe_roundtrip_ms_subtracted": round(roundtrip * 1e3, 1),
            "compile_seconds": round(compile_s, 1),
            "total_seconds": round(total, 4),
            "per_forward_seconds": round(total / bs, 4),
            "achieved_tflops_per_sec": round(bs * fwd_tflops / total, 1),
            "fraction_of_v5e_bf16_peak": round(bs * fwd_tflops / total / 197.0, 3),
            "stages": {k: round(v, 4) for k, v in timings.items()},
            "stage_tflops_per_sec": stage_tflops,
            "stage_roofline": stage_floor,
        }
        print(f"batch {bs}: total {total:.3f}s "
              f"({total / bs * 1e3:.1f} ms/fwd, "
              f"{bs * fwd_tflops / total:.0f} TFLOP/s) stages="
              f"{ {k: round(v, 3) for k, v in timings.items()} } "
              f"rates={stage_tflops}", flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/SEGMENT_PROFILE.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"ok": True}))


if __name__ == "__main__":
    main()
