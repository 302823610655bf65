"""Benchmark: sec/image, SDXL-architecture ElasticDiffusion 1024x2048 @ 50
steps on one chip (BASELINE.md tracked metric).

Prints ONE JSON line:
  {"metric": ..., "value": sec_per_image, "unit": "s",
   "vs_baseline": north_star_chip_seconds / measured_chip_seconds, ...}

vs_baseline is measured against the BASELINE.json north star (SDXL 1024x2048,
50 steps, <20 s on v5e-8 == 160 chip-seconds/image): >= 1.0 means the
north-star per-chip budget is met. The reference publishes no numbers
(BASELINE.md), so this derived target is the tracked bar.

The workload is UNet-bound: every signal estimate is a native-resolution UNet
forward (SURVEY §3.1 cost model: 2*(rs+1) + V + 2 + V forwards/step with
repaint). Default mode 'micro' times the batched native-resolution UNet
forward directly and applies that exact forward count — one small compiled
program, robust against slow remote compiles. Mode 'step' compiles and times
the full fused denoise step instead (same number it converges to, much larger
one-time compile).

Env knobs: ED_BENCH_PRESET=sdxl|sd15 (default sdxl), ED_BENCH_MODE=micro|step,
ED_BENCH_STEPS=N measured iterations (default 3), ED_BENCH_RS (default 7).

Weights are random-init (zero-egress environment); the compute graph — and
therefore the performance — is identical to converted checkpoints.
"""

import json
import os
import time

import sys
import jax
import jax.numpy as jnp


def _log(msg, t0=[None]):
    now = time.time()
    if t0[0] is None:
        t0[0] = now
    print(f"[bench +{now - t0[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _cost_model(rs: int, V: int, repaint: bool = True):
    """UNet native-res forwards per denoise step (SURVEY §3.1)."""
    return 2 * (rs + 1) + V + (2 + V if repaint else 0)


def measure_decode(pipe, height, width):
    """Warm decode seconds at the preset resolution (the tracked metric is
    sec/IMAGE — r2's bench excluded decode; VERDICT r2 weak #3).

    Uses the PRODUCTION decode path (pipe.halo_decode: predictive
    monolithic-vs-streamed choice), not raw monolithic decode_latents —
    above the single-chip memory budget monolithic would OOM, and on this
    backend a failed program's allocations are never reclaimed, which
    would poison the rest of the bench process."""
    import jax
    import jax.numpy as jnp
    vsf = pipe.vae_scale_factor
    lat = jax.random.normal(jax.random.PRNGKey(7),
                            (1, 4, height // vsf, width // vsf), jnp.float32)

    def sync(a):
        return float(a[0, 0, 0, 0])

    t0 = time.time()
    sync(pipe.halo_decode(lat))
    cold = time.time() - t0
    t0 = time.time()
    sync(pipe.halo_decode(lat))
    warm = time.time() - t0
    _log(f"decode cold={cold:.1f}s warm={warm:.1f}s")
    return warm, cold


def micro_bench(pipe, height, width, rs, n_measure):
    """Time the batched native-resolution UNet forward; apply the cost model."""
    from elasticdiffusion_tpu.ops.views import build_view_plan
    b = pipe.bundle
    s = b.sample_size
    lat_h, lat_w = height // pipe.vae_scale_factor, width // pipe.vae_scale_factor
    V = build_view_plan(lat_h, lat_w, pipe.view_config).num_views
    batch = max(2, min(V, 8))  # representative UNet batch

    _log("encoding text")
    uncond, pooled_u = pipe.get_text_embeds([""])
    _log("text encoded; compiling unet forward")
    ctx = jnp.tile(uncond, (batch, 1, 1)).astype(b.runtime.compute_dtype)
    kwargs = {}
    if b.config.is_xl:
        tids = pipe._get_add_time_ids((4 * height, 4 * width), (0, 0),
                                      (4 * height, 4 * width))
        kwargs = {"added_text_embeds": jnp.tile(pooled_u, (batch, 1)),
                  "added_time_ids": jnp.tile(tids, (batch, 1))}
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (batch, b.in_channels, s, s), b.runtime.compute_dtype)

    # segmented execution: this environment's remote XLA compile service
    # cannot compile full-SD single programs (see models/unet.py); the
    # per-block chain is the production execution mode at SD scale.
    segmented = os.environ.get("ED_BENCH_SEGMENTED", "1") == "1"
    if segmented:
        fwd = lambda x_, t: b.apply_unet_segmented(x_, t, ctx, **kwargs)
    else:
        fwd = jax.jit(lambda x_, t: b.apply_unet(x_, t, ctx, **kwargs))
    t0 = time.time()
    out = fwd(x, jnp.float32(500.0))
    out.block_until_ready()
    compile_s = time.time() - t0
    _log(f"unet forward compiled ({compile_s:.0f}s, segmented={segmented})")

    # block_until_ready on this tunnel backend does not wait for device
    # execution; synchronize with a 1-element device->host fetch and subtract
    # the measured bare roundtrip. Chain length kept at 2 (HBM headroom).
    def sync(a):
        return float(a[0, 0, 0, 0])
    sync(out)  # settle warmup
    t0 = time.time()
    for _ in range(4):
        sync(out)
    roundtrip = (time.time() - t0) / 4
    K = int(os.environ.get("ED_BENCH_CHAIN", "1"))
    times = []
    for i in range(max(3, n_measure)):
        t0 = time.time()
        o = out
        for k in range(K):
            o = fwd(o * 0.999, jnp.float32(500.0 - k))
        sync(o)
        times.append(max((time.time() - t0 - roundtrip) / K, 1e-9))
    _log(f"roundtrip={roundtrip*1e3:.1f}ms per_call={min(times)*1e3:.1f}ms")
    per_fwd = min(times) / batch
    return per_fwd, V, compile_s, {}


def step_bench(pipe, height, width, rs, n_measure):
    """Compile and run the PRODUCTION denoise step on chip — the full
    elastic update (direction resampling, batched views, repaint, RRG),
    host-orchestrated/segmented at SD scale (core/segmented.py), fused
    single-program otherwise."""
    from elasticdiffusion_tpu.core.entry import make_denoise_step
    from elasticdiffusion_tpu.core.segmented import should_segment
    seg = should_segment(pipe.runtime, pipe.bundle.config)
    step_fn, (lat, key, inp), view_plan = make_denoise_step(
        pipe, height, width, num_inference_steps=50, resampling_steps=rs,
        repaint=True, segmented=seg)
    step = step_fn if seg else jax.jit(step_fn)
    _log(f"step built (segmented={seg}); compiling")

    def sync(a):
        return float(a[0, 0, 0, 0])

    t0 = time.time()
    warm_s = 0.0
    if seg:
        # concurrent chain+glue compile (cold-start lever, core/segmented.py
        # warm_start); counted inside compile_s — it IS the cold start.
        # Passing inp warms the GLUE programs too (pre/post/ddim tails),
        # which used to compile serially inside the first step call — the
        # unexplained ~120 s of VERDICT r4 weak #2.
        nw = step.warm_start(inp)
        warm_s = time.time() - t0
        _log(f"warm_start: {nw} programs in {warm_s:.0f}s")
    t1 = time.time()
    out, key, _ = step(lat, key, inp)
    sync(out)
    first_step_s = time.time() - t1
    compile_s = time.time() - t0
    _log(f"step compiled+ran ({compile_s:.0f}s; warm_start {warm_s:.0f}s + "
         f"first step {first_step_s:.0f}s)")
    times = []
    for i in range(n_measure):
        if seg and i == n_measure - 1:
            step.collect_phase_times = True  # last rep: phase breakdown
        t0 = time.time()
        out, key, _ = step(out, key, inp)
        sync(out)
        times.append(time.time() - t0)
    V = view_plan.num_views
    per_fwd = min(times) / _cost_model(rs, V)
    extras = {"step_seconds": round(min(times), 3),
              # per-program cold-start breakdown (VERDICT r4 next #2):
              # warm_start = concurrent chain+glue compiles, first_step =
              # whatever still compiled serially in the first call (target
              # ~= one warm step), decode cold is added by measure_decode
              "compile_breakdown": {
                  "warm_start_chain_and_glue_s": round(warm_s, 1),
                  "first_step_s": round(first_step_s, 1)}}
    if seg and step.phase_times:
        import math
        ph = dict(step.phase_times)
        extras["phase_seconds"] = {k: round(v, 3) for k, v in ph.items()}
        # Honest v5e-8 projection from MEASURED single-chip phase times and
        # the step's actual parallel widths (no real multi-chip hardware in
        # this environment — the sharded program itself is validated on the
        # 8-device CPU mesh by dryrun_multichip). The estimate phases are
        # ONE UNet batch each (core/segmented.py merged estimate):
        #   main    batch W = 2*(rs+1)+V -> ceil(W/8) waves on 8 chips
        #   repaint batch W = 2+V        -> ceil(W/8) waves
        #   sched                        -> serial
        n_mesh = 8
        w_main = 2 * (rs + 1) + V
        w_rep = 2 + V
        proj_step = (
            ph.get("estimate", 0.0) * math.ceil(w_main / n_mesh) / w_main
            + ph.get("estimate_repaint", 0.0) * math.ceil(w_rep / n_mesh) / w_rep
            + ph.get("sched", 0.0))
        # quantified padded-batch waste on the 8-wide mesh (VERDICT r4 #7):
        # pad rows are throwaway compute baked into the projection above.
        # Composition is rs-driven (batch = 2*(rs+1)+V), so adjacent rs
        # values land exactly on mesh multiples — documented in
        # artifacts/MESH_PACKING.md.
        pm = -(-w_main // n_mesh) * n_mesh
        pr = -(-w_rep // n_mesh) * n_mesh
        extras["mesh_padding_waste"] = {
            "main_batch": w_main, "main_padded": pm,
            "repaint_batch": w_rep, "repaint_padded": pr,
            "throwaway_fraction": round(
                1.0 - (w_main + w_rep) / (pm + pr), 4)}
        fwd_per_image = 50 * _cost_model(rs, V) - (2 + V)
        proj_image = proj_step / _cost_model(rs, V) * fwd_per_image
        extras["projected_v5e8_denoise_sec_per_image"] = round(proj_image, 1)
        extras["projection_basis"] = (
            "measured phase seconds * ceil(padded_batch/8)/batch per "
            f"estimate phase (main batch {w_main} padded to "
            f"{-(-w_main // n_mesh) * n_mesh}, repaint batch {w_rep} padded "
            f"to {-(-w_rep // n_mesh) * n_mesh}; padding implemented in "
            "parallel/sharding.py pad_and_shard_views, asserted sharded by "
            "dryrun_multichip) + sched; + measured single-chip decode / 8 "
            "(halo decode shards bands exactly, parallel/halo_decode.py)")
    return per_fwd, V, compile_s, extras


def main():
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    from elasticdiffusion_tpu.models.registry import load_bundle

    preset = os.environ.get("ED_BENCH_PRESET", "sdxl")
    mode = os.environ.get("ED_BENCH_MODE", "micro")
    n_measure = int(os.environ.get("ED_BENCH_STEPS", "3"))
    rs = int(os.environ.get("ED_BENCH_RS", "7"))
    num_steps = 50

    if preset == "cpu-smoke":
        # force the CPU backend BEFORE any backend query: this environment
        # preloads jax with JAX_PLATFORMS=axon (a TPU tunnel), and if the
        # tunnel is down, backend init hangs — the cpu-smoke fallback must
        # not depend on it (env-var edits are too late, config.update works;
        # same bootstrap as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    on_tpu = jax.default_backend() not in ("cpu",)
    runtime = RuntimeConfig(
        param_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas="auto",
        # A/B hook for the chain-merge experiment (default full_core — the
        # on-chip winner; see configs.RuntimeConfig.segment_merge_core)
        segment_merge_core=os.environ.get("ED_SEGMENT_MERGE_CORE",
                                          "full_core"),
        # A/B hook for whole-phase fusion (pre+UNet+post as one program)
        segment_phase_fuse=os.environ.get("ED_SEGMENT_PHASE_FUSE", "off"))

    if preset == "sdxl" and on_tpu:
        sd_version, height, width = "XL1.0", 1024, 2048
    elif preset == "sd15" and on_tpu:
        sd_version, height, width = "1.5", 512, 768
    else:
        sd_version = "entry-sd"

    _log(f"preset={preset} mode={mode} backend={jax.default_backend()}")
    if sd_version == "entry-sd":
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        pipe = mod._build_pipe()
        height = width = 2 * pipe.bundle.config.native_resolution
    else:
        bundle = load_bundle(sd_version, runtime=runtime)
        _log("bundle initialized")
        pipe = ElasticDiffusion(bundle=bundle, runtime=runtime)

    bench_fn = micro_bench if mode == "micro" else step_bench
    per_fwd, V, compile_s, extras = bench_fn(pipe, height, width, rs, n_measure)
    _log(f"measured: per_fwd={per_fwd:.4f}s V={V} compile={compile_s:.0f}s")

    # the metric is sec/IMAGE: denoise + decode (r2 excluded decode). A
    # failed decode sub-measurement must be LOUD in the artifact (r3's
    # silently reported decode_seconds=0.0 while the metric still claimed
    # sec/image): the JSON carries decode_failed/decode_error, and the
    # projection basis is annotated as denoise-only.
    decode_failed = None
    try:
        decode_s, decode_cold_s = measure_decode(pipe, height, width)
        if "compile_breakdown" in extras:
            extras["compile_breakdown"]["decode_cold_s"] = \
                round(decode_cold_s, 1)
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        decode_failed = f"{type(e).__name__}: {e}"
        _log(f"decode measurement FAILED ({decode_failed}); the reported "
             "value is DENOISE-ONLY and under-counts sec/image")
        decode_s = 0.0

    fwd_per_step = _cost_model(rs, V)
    # last step has no repaint: subtract its extra forwards once
    fwd_per_image = num_steps * fwd_per_step - (2 + V)
    sec_per_image = per_fwd * fwd_per_image + decode_s

    # achieved MXU rate vs v5e bf16 peak (~197 TFLOP/s): how much kernel
    # headroom remains (utils/flops.py analytic matmul/conv count)
    from elasticdiffusion_tpu.utils.flops import (
        roofline_seconds, unet_forward_flops, vae_decoder_costs,
    )
    s = pipe.bundle.sample_size
    fwd_tflops = unet_forward_flops(pipe.bundle.config.unet, s, s) / 1e12
    extras["model_tflops_per_forward"] = round(fwd_tflops, 6)
    extras["achieved_tflops_per_sec"] = round(fwd_tflops / max(per_fwd, 1e-9), 1)
    extras["fraction_of_v5e_bf16_peak"] = round(
        fwd_tflops / max(per_fwd, 1e-9) / 197.0, 3)
    if decode_s and jax.default_backend() not in ("cpu",):
        # decode roofline floor at the fp32 pass count actually configured
        # ('high' = 3-pass default, 'highest' = 6-pass); v5e rates, so
        # TPU-backend only
        fp32_dec = (pipe.bundle.config.vae.force_upcast
                    and pipe.runtime.vae_decode_fp32)
        passes = {"high": 3, "bfloat16_3x": 3, "highest": 6,
                  "float32": 6}.get(
            pipe.runtime.vae_matmul_precision, 1) if fp32_dec else 1
        dc = vae_decoder_costs(pipe.bundle.config.vae,
                               height // pipe.vae_scale_factor,
                               width // pipe.vae_scale_factor,
                               bytes_per_el=4 if fp32_dec else 2)
        floor = roofline_seconds(dc, 1, tflops_peak=197.0 / passes)
        extras["decode_floor_seconds"] = round(floor["floor_s"], 2)
        extras["decode_measured_over_floor"] = round(
            decode_s / max(floor["floor_s"], 1e-9), 2)
    if "projected_v5e8_denoise_sec_per_image" in extras:
        extras["projected_v5e8_sec_per_image"] = round(
            extras["projected_v5e8_denoise_sec_per_image"] + decode_s / 8, 1)
    if decode_failed is not None:
        extras["decode_failed"] = True
        extras["decode_error"] = decode_failed
        if "projection_basis" in extras:
            extras["projection_basis"] += (
                " [decode measurement FAILED: value and projection are "
                "DENOISE-ONLY]")

    # scan_depth state: 'auto' resolves ON iff tools/prime_cache.py primed
    # the persistent cache for this topology (the measured 4% win without
    # the 668 s cold compile; configs.RuntimeConfig.scan_depth)
    try:
        from elasticdiffusion_tpu.models.registry import _scan_depth_on
        extras["scan_depth_on"] = _scan_depth_on(pipe.runtime,
                                                 pipe.bundle.config)
    except Exception:
        pass

    north_star_chip_seconds = 20.0 * 8  # <20 s on v5e-8
    result = {
        "metric": "sec/image SDXL 1024x2048 @50 steps per chip; "
                  "UNet view-forwards/sec",
        "value": round(sec_per_image, 3),
        "unit": "s",
        "vs_baseline": round(north_star_chip_seconds / max(sec_per_image, 1e-9), 4),
        "unet_view_forwards_per_sec": round(1.0 / max(per_fwd, 1e-9), 3),
        "views": V,
        "fwd_per_step": fwd_per_step,
        "sec_per_forward": round(per_fwd, 5),
        "decode_seconds": round(decode_s, 2),
        "compile_seconds": round(compile_s, 1),
        "preset": f"{sd_version}@{height}x{width}",
        "mode": mode,
        "backend": jax.default_backend(),
        **extras,
    }
    print(json.dumps(result))


def main_with_fallback():
    """Default driver path: try presets largest-first, each in a subprocess
    with a wall-clock budget (this environment's XLA compile service takes
    minutes-to-hours for SD-scale single programs when the persistent cache
    is cold; a bench that reports a smaller preset beats one that hangs)."""
    import subprocess
    budget = int(os.environ.get("ED_BENCH_TIMEOUT", "2400"))

    # quick tunnel-health probe: if the TPU backend can't even enumerate
    # devices, don't burn the budget on presets that would hang at backend
    # init — go straight to the CPU smoke preset. Healthy device enumeration
    # takes well under a minute (the minutes-to-hours pathology is remote
    # COMPILES, which the probe never triggers); the generous default only
    # delays the fallback when the tunnel is truly dead. 0 disables the
    # probe.
    presets = (("sdxl", "step"), ("sdxl", "micro"),
               ("sd15", "step"), ("sd15", "micro"),
               ("cpu-smoke", "micro"))
    probe_s = int(os.environ.get("ED_BENCH_PROBE_TIMEOUT", "900"))
    if probe_s:
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=probe_s, check=True)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print("[bench] TPU backend probe failed; skipping TPU presets",
                  file=sys.stderr, flush=True)
            presets = (("cpu-smoke", "micro"),)
    for preset, mode in presets:
        env = dict(os.environ)
        env["ED_BENCH_PRESET"] = preset
        env["ED_BENCH_MODE"] = mode
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=budget)
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if lines:
                print(lines[-1])
                return
            print(out.stderr[-2000:], file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"[bench] preset {preset} exceeded {budget}s (cold compile);"
                  f" falling back", file=sys.stderr, flush=True)
    raise SystemExit("bench: all presets failed")


if __name__ == "__main__":
    if os.environ.get("ED_BENCH_PRESET"):
        main()
    else:
        main_with_fallback()
