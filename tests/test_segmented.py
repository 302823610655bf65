"""Segmented UNet execution must equal the full forward exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from toy_configs import make_toy_bundle


def test_segmented_matches_full():
    b = make_toy_bundle()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 12))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 16))
    t = jnp.float32(500.0)
    full = b.apply_unet(x, t, ctx)
    seg = b.apply_unet_segmented(x, t, ctx)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def test_segmented_core_merges_match_full():
    """The deeper chain merges (RuntimeConfig.segment_merge_core
    'down_mid' / 'full_core') are numerically identical to the full
    forward and the default chain."""
    import dataclasses
    b = make_toy_bundle()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 12))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 16))
    t = jnp.float32(500.0)
    full = b.apply_unet(x, t, ctx)
    for core in ("down_mid", "full_core", "mono"):
        bc = dataclasses.replace(
            b, runtime=dataclasses.replace(b.runtime,
                                           segment_merge_core=core))
        seg = bc.apply_unet_segmented(x, t, ctx)
        np.testing.assert_allclose(np.asarray(seg), np.asarray(full),
                                   atol=2e-5, rtol=1e-4, err_msg=core)


def test_segmented_core_merge_controlnet_fallback():
    """Under ControlNet residuals the core merges must fall back to the
    unmerged chain (injection happens between down and mid) and still equal
    the full forward."""
    import dataclasses
    b = make_toy_bundle(xl=True, controlnet="canny")
    b = dataclasses.replace(
        b, runtime=dataclasses.replace(b.runtime,
                                       segment_merge_core="full_core"))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 40))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, 24))
    tids = jnp.asarray([[32., 32., 0., 0., 32., 32.]])
    cond = jnp.zeros((1, 3, 16, 16))
    down, mid = b.apply_controlnet(x, jnp.float32(500.0), ctx, cond,
                                   added_text_embeds=pooled,
                                   added_time_ids=tids)
    full = b.apply_unet(x, jnp.float32(500.0), ctx, added_text_embeds=pooled,
                        added_time_ids=tids, down_block_residuals=down,
                        mid_block_residual=mid)
    seg = b.apply_unet_segmented(x, jnp.float32(500.0), ctx,
                                 added_text_embeds=pooled,
                                 added_time_ids=tids,
                                 down_block_residuals=down,
                                 mid_block_residual=mid)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def test_segmented_xl_with_controlnet_residuals():
    b = make_toy_bundle(xl=True, controlnet="canny")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 40))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, 24))
    tids = jnp.asarray([[32., 32., 0., 0., 32., 32.]])
    cond = jnp.zeros((1, 3, 16, 16))  # latent 8x8 * toy vsf 2
    down, mid = b.apply_controlnet(x, jnp.float32(500.0), ctx, cond,
                                   added_text_embeds=pooled,
                                   added_time_ids=tids)
    full = b.apply_unet(x, jnp.float32(500.0), ctx, added_text_embeds=pooled,
                        added_time_ids=tids, down_block_residuals=down,
                        mid_block_residual=mid)
    seg = b.apply_unet_segmented(x, jnp.float32(500.0), ctx,
                                 added_text_embeds=pooled,
                                 added_time_ids=tids,
                                 down_block_residuals=down,
                                 mid_block_residual=mid)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def _gen(bundle, segmented, _rt_extra=None, **kw):
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off",
                       segmented_step="on" if segmented else "off",
                       **(_rt_extra or {}))
    pipe = ElasticDiffusion(bundle=bundle, runtime=rt)
    pipe.seed_everything(7)
    arr, log = pipe.generate_image(return_arrays=True, **kw)
    return arr, pipe.last_metrics


def test_segmented_step_matches_fused_pipeline():
    """The host-orchestrated step (core/segmented.py) must reproduce the
    fused jitted step draw-for-draw: same seed -> same image."""
    b = make_toy_bundle()
    kw = dict(prompts="a cat", height=32, width=48, num_inference_steps=2,
              guidance_scale=7.5, resampling_steps=2, new_p=0.3,
              rrg_init_weight=1000, rrg_stop_t=0.0, repaint_sampling=True)
    fused, m_f = _gen(b, segmented=False, **kw)
    seg, m_s = _gen(b, segmented=True, **kw)
    assert m_s["segmented"] and not m_f["segmented"]
    assert m_s["unet_view_forwards"] == m_f["unet_view_forwards"]
    np.testing.assert_allclose(seg, fused, atol=5e-5, rtol=1e-4)


def test_segmented_step_matches_fused_xl_controlnet():
    b = make_toy_bundle(xl=True, controlnet="canny")
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    kw = dict(prompts="a cat", height=32, width=32, num_inference_steps=2,
              guidance_scale=7.5, resampling_steps=1, new_p=0.3,
              rrg_init_weight=0, repaint_sampling=True,
              condition_image=cond, controlnet_conditioning_scale=0.5)
    fused, _ = _gen(b, segmented=False, **kw)
    seg, m_s = _gen(b, segmented=True, **kw)
    assert m_s["segmented"]
    np.testing.assert_allclose(seg, fused, atol=5e-5, rtol=1e-4)


def test_segmented_phase_times():
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", segmented_step="on")
    pipe = ElasticDiffusion(bundle=make_toy_bundle(), runtime=rt)
    pipe.collect_phase_times = True
    pipe.seed_everything(0)
    pipe.generate_image("a cat", height=32, width=32, num_inference_steps=2,
                        resampling_steps=1, repaint_sampling=True,
                        return_arrays=True)
    phases = pipe.last_metrics["phase_seconds"]
    assert set(phases) == {"estimate", "estimate_repaint", "sched"}
    assert all(v > 0 for v in phases.values())


def test_segmented_matches_fused_batch2():
    """Prompt batch B=2 through the merged-estimate segmented step."""
    b = make_toy_bundle()
    kw = dict(prompts=["a cat", "a dog"], height=32, width=32,
              num_inference_steps=2, guidance_scale=7.5, resampling_steps=1,
              new_p=0.3, rrg_init_weight=500, rrg_stop_t=0.0,
              repaint_sampling=True)
    fused, _ = _gen(b, segmented=False, **kw)
    seg, m_s = _gen(b, segmented=True, **kw)
    assert m_s["segmented"]
    assert fused.shape == seg.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(seg, fused, atol=5e-5, rtol=1e-4)


def test_segmented_controlnet_batch2():
    """B=2 prompts + condition image through the segmented step: the per-view
    condition must broadcast over the prompt batch (V*B rows, not V) —
    ADVICE r2 repro (crashed with incompatible broadcast shapes)."""
    b = make_toy_bundle(xl=True, controlnet="canny")
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    kw = dict(prompts=["a cat", "a dog"], height=32, width=32,
              num_inference_steps=2, guidance_scale=7.5, resampling_steps=1,
              new_p=0.3, rrg_init_weight=0, repaint_sampling=True,
              condition_image=cond, controlnet_conditioning_scale=0.5)
    fused, _ = _gen(b, segmented=False, **kw)
    seg, m_s = _gen(b, segmented=True, **kw)
    assert m_s["segmented"]
    assert fused.shape == seg.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(seg, fused, atol=5e-5, rtol=1e-4)


def test_segmented_chunked_matches_whole():
    """view_batch_size chunking of the segmented merged batch (the memory
    knob, /root/reference/elastic_diffusion.py:830-831) must be numerically
    identical to the whole-batch dispatch — including a ragged tail
    (V=24 views at 32x48, chunks of 5 -> 4 full chunks + padded tail)."""
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    b = make_toy_bundle()
    kw = dict(prompts="a cat", height=32, width=48, num_inference_steps=2,
              guidance_scale=7.5, resampling_steps=2, new_p=0.3,
              rrg_init_weight=500, rrg_stop_t=0.0, repaint_sampling=True,
              return_arrays=True)
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", segmented_step="on")

    whole = ElasticDiffusion(bundle=b, runtime=rt)
    assert whole.view_batch_size == 0  # TPU-first default: one batched call
    whole.seed_everything(7)
    a, _ = whole.generate_image(**kw)

    chunked = ElasticDiffusion(bundle=b, runtime=rt, view_batch_size=5)
    chunked.seed_everything(7)
    c, _ = chunked.generate_image(**kw)

    np.testing.assert_allclose(c, a, atol=5e-5, rtol=1e-4)


def test_segmented_chunked_controlnet_matches_whole():
    """Chunking + ControlNet together — the exact combination that OOMed the
    SDXL flagship on a single chip (direction rows used to run as one whole
    batch even when the knob was set). The uniform chunker must slice the
    per-row ControlNet condition alongside latents/context and stay
    numerically identical to the whole-batch dispatch."""
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    b = make_toy_bundle(xl=True, controlnet="canny")
    cond = np.random.RandomState(1).rand(1, 3, 32, 48).astype(np.float32)
    kw = dict(prompts="a cat", height=32, width=48, num_inference_steps=2,
              guidance_scale=7.5, resampling_steps=2, new_p=0.3,
              rrg_init_weight=500, rrg_stop_t=0.0, repaint_sampling=True,
              condition_image=cond, controlnet_conditioning_scale=0.5,
              return_arrays=True)
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", segmented_step="on")

    whole = ElasticDiffusion(bundle=b, runtime=rt)
    whole.seed_everything(7)
    a, _ = whole.generate_image(**kw)

    # vbs=5 over a merged batch of 2*3 + V rows: chunk boundaries cross the
    # direction/view frontier and leave a ragged padded tail
    chunked = ElasticDiffusion(bundle=b, runtime=rt, view_batch_size=5)
    chunked.seed_everything(7)
    c, _ = chunked.generate_image(**kw)

    np.testing.assert_allclose(c, a, atol=5e-5, rtol=1e-4)


def test_segmented_phase_fuse_matches_unfused():
    """segment_phase_fuse='on' (the whole estimate phase — pre glue, merged
    UNet batch, post glue — as ONE jitted program) must reproduce the
    unfused segmented step draw-for-draw, repaint and RRG included."""
    b = make_toy_bundle()
    kw = dict(prompts="a cat", height=32, width=48, num_inference_steps=2,
              guidance_scale=7.5, resampling_steps=2, new_p=0.3,
              rrg_init_weight=1000, rrg_stop_t=0.0, repaint_sampling=True)
    plain, _ = _gen(b, segmented=True, **kw)
    fused, m = _gen(b, segmented=True,
                    _rt_extra={"segment_phase_fuse": "on"}, **kw)
    assert m["segmented"]
    np.testing.assert_allclose(fused, plain, atol=5e-5, rtol=1e-4)


def test_segmented_phase_fuse_controlnet_batch2():
    """Phase fusion with ControlNet conditions and a B=2 prompt batch: the
    condition rows and cn_scale ride through the single-program phase."""
    b = make_toy_bundle(xl=True, controlnet="canny")
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    kw = dict(prompts=["a cat", "a dog"], height=32, width=32,
              num_inference_steps=2, guidance_scale=7.5, resampling_steps=1,
              new_p=0.3, rrg_init_weight=0, repaint_sampling=True,
              condition_image=cond, controlnet_conditioning_scale=0.5)
    plain, _ = _gen(b, segmented=True, **kw)
    fused, m = _gen(b, segmented=True,
                    _rt_extra={"segment_phase_fuse": "on"}, **kw)
    assert m["segmented"]
    np.testing.assert_allclose(fused, plain, atol=5e-5, rtol=1e-4)


def test_segmented_phase_fuse_chunked_matches_whole():
    """view_batch_size chunking INSIDE the fused phase program (the
    production OOM knob for SDXL+ControlNet at 2048^2 reaches
    _unet_chunked's chunk loop under segment_phase_fuse='on'), and the same
    combination under an 8-wide 'views' mesh where each chunk re-pads and
    re-shards to the mesh width (VERDICT r3 weak #4 / ADVICE r3): both must
    equal the whole-batch unfused single-device run."""
    import jax
    import dataclasses
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    b = make_toy_bundle(xl=True, controlnet="canny")
    cond = np.random.RandomState(1).rand(1, 3, 32, 48).astype(np.float32)
    kw = dict(prompts="a cat", height=32, width=48, num_inference_steps=2,
              guidance_scale=7.5, resampling_steps=2, new_p=0.3,
              rrg_init_weight=500, rrg_stop_t=0.0, repaint_sampling=True,
              condition_image=cond, controlnet_conditioning_scale=0.5,
              return_arrays=True)
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", segmented_step="on")

    whole = ElasticDiffusion(bundle=b, runtime=rt)
    whole.seed_everything(7)
    a, _ = whole.generate_image(**kw)

    # vbs=5: chunk boundaries cross the direction/view frontier and leave a
    # ragged padded tail, all inside one fused phase program
    rt_f = dataclasses.replace(rt, segment_phase_fuse="on")
    fused = ElasticDiffusion(bundle=b, runtime=rt_f, view_batch_size=5)
    fused.seed_everything(7)
    c, _ = fused.generate_image(**kw)
    np.testing.assert_allclose(c, a, atol=5e-5, rtol=1e-4)

    if len(jax.devices()) >= 8:
        rt_m = dataclasses.replace(rt, segment_phase_fuse="on",
                                   mesh_shape=(1, 8))
        bm = make_toy_bundle(xl=True, controlnet="canny", runtime=rt_m)
        meshed = ElasticDiffusion(bundle=bm, runtime=rt_m, view_batch_size=5)
        assert meshed.mesh is not None
        meshed.seed_everything(7)
        d, _ = meshed.generate_image(**kw)
        np.testing.assert_allclose(d, a, atol=5e-5, rtol=1e-4)


def test_segmented_scripted_matches_fused():
    """Scripted-noise injection (the parity-harness path) must agree
    between segmented and fused execution."""
    b = make_toy_bundle()
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    from elasticdiffusion_tpu.ops.resample import build_resample_plan
    H, W = 16, 24
    rs, steps = 2, 2
    probe = ElasticDiffusion(bundle=b, runtime=RuntimeConfig(
        param_dtype=jnp.float32, compute_dtype=jnp.float32, use_pallas="off"))
    dh, dw = probe.get_downsample_size(32, 48)
    plan = build_resample_plan(H, W, dh, dw)
    N = plan.num_blocks
    rng = np.random.RandomState(0)
    init = rng.standard_normal((1, 4, H, W)).astype(np.float32)
    n_micro = 1000 // steps
    picks_main, picks_repaint, rep_noise = [], [], []
    for _ in range(steps):
        p = rng.randint(0, 4, (rs + 1, N)).astype(np.int32)
        p[0] = 0
        picks_main.append(p)
        picks_repaint.append(np.zeros((1, N), np.int32))
        rep_noise.append(rng.standard_normal(
            (n_micro, 1, 4, H, W)).astype(np.float32))
    scripted = {"picks_main": picks_main, "picks_repaint": picks_repaint,
                "repaint_noise": rep_noise}
    kw = dict(prompts="a cat", height=32, width=48, num_inference_steps=steps,
              guidance_scale=7.5, resampling_steps=rs, repaint_sampling=True,
              rrg_init_weight=500, rrg_stop_t=0.0, latents=init,
              scripted_noise=scripted)
    fused, _ = _gen(b, segmented=False, **kw)
    seg, m_s = _gen(b, segmented=True, **kw)
    assert m_s["segmented"]
    np.testing.assert_allclose(seg, fused, atol=5e-5, rtol=1e-4)


def test_warm_start_compiles_exact_production_signatures():
    """step.warm_start() must compile the chain programs for EXACTLY the
    signatures the real step calls: a later real step adds ZERO new cache
    entries to any unet_seg_* program. A drifted dummy signature (shape,
    dtype, weak-type or kwarg mismatch) would silently DOUBLE every chain
    compile — the opposite of the warm-up's purpose (pay each compile once,
    in parallel; core/segmented.py warm_start)."""
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.entry import make_denoise_step
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    b = make_toy_bundle()
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", segmented_step="on")
    pipe = ElasticDiffusion(bundle=b, runtime=rt, verbose=False)
    step, (lat, key, inp), _ = make_denoise_step(
        pipe, 32, 48, num_inference_steps=2, guidance_scale=7.5,
        resampling_steps=1, new_p=0.3, repaint=True, segmented=True)

    n = step.warm_start()
    # two estimate signatures (main n_sub=2, repaint n_sub=1) x the chain's
    # per-stage programs
    assert n >= 4, f"warm start dispatched only {n} programs"
    cache = pipe.bundle.__dict__["_jit_cache"]
    sizes = {k: v._cache_size() for k, v in cache.items()
             if k.startswith("unet_seg_")}
    assert sizes, "no chain programs were compiled by warm_start"

    out, _, _ = step(lat, key, inp)
    assert bool(jnp.isfinite(out).all())
    sizes_after = {k: v._cache_size() for k, v in cache.items()
                   if k.startswith("unet_seg_")}
    assert sizes_after == sizes, (
        "the real step recompiled warm-started programs (signature drift): "
        f"{sizes} -> {sizes_after}")


def test_warm_start_aot_mode():
    """warm_start(mode='aot') must lower+compile every program WITHOUT
    executing anything on device (zero activation HBM — the mode the
    headroom gate picks when ControlNet is resident, where concurrent
    zero-executions OOM a 16 GB chip; round 5), and the real step must
    still run correctly afterward. Uses the ControlNet toy bundle — the
    exact configuration that triggers the gate in production."""
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.entry import make_denoise_step
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    b = make_toy_bundle(xl=True, controlnet="canny")
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", segmented_step="on")
    pipe = ElasticDiffusion(bundle=b, runtime=rt, verbose=False)
    dh, dw = pipe.get_downsample_size(32, 48)
    vsf = pipe.vae_scale_factor
    cond = jnp.asarray(np.random.RandomState(1)
                       .rand(1, 3, dh * vsf, dw * vsf).astype(np.float32))
    step, (lat, key, inp), _ = make_denoise_step(
        pipe, 32, 48, num_inference_steps=2, guidance_scale=7.5,
        resampling_steps=1, new_p=0.3, repaint=True, segmented=True,
        controlnet_cond=cond, controlnet_scale=0.5)

    n = step.warm_start(inp, mode="aot")
    assert n >= 4, f"aot warm start dispatched only {n} programs"
    out, _, _ = step(lat, key, inp)
    assert bool(jnp.isfinite(out).all())

    # aot and exec must produce identical step results (same programs)
    b2 = make_toy_bundle(xl=True, controlnet="canny")
    pipe2 = ElasticDiffusion(bundle=b2, runtime=rt, verbose=False)
    step2, (lat2, key2, inp2), _ = make_denoise_step(
        pipe2, 32, 48, num_inference_steps=2, guidance_scale=7.5,
        resampling_steps=1, new_p=0.3, repaint=True, segmented=True,
        controlnet_cond=cond, controlnet_scale=0.5)
    step2.warm_start(inp2, mode="exec")
    out2, _, _ = step2(lat2, key2, inp2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_warm_start_chunked_controlnet():
    """Warm-up under the memory knob + ControlNet: the dummy chunk must
    mirror _run_chunk's slicing exactly, and the ControlNet program and
    residual-fed chain signatures must be the ones the real step uses —
    same zero-new-compiles contract as the plain test above."""
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.entry import make_denoise_step
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    b = make_toy_bundle(xl=True, controlnet="canny")
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", segmented_step="on")
    pipe = ElasticDiffusion(bundle=b, runtime=rt, verbose=False,
                            view_batch_size=5)
    dh, dw = pipe.get_downsample_size(32, 48)
    vsf = pipe.vae_scale_factor
    cond = jnp.asarray(np.random.RandomState(0)
                       .rand(1, 3, dh * vsf, dw * vsf).astype(np.float32))
    step, (lat, key, inp), _ = make_denoise_step(
        pipe, 32, 48, num_inference_steps=2, guidance_scale=7.5,
        resampling_steps=1, new_p=0.3, repaint=True, segmented=True,
        controlnet_cond=cond, controlnet_scale=0.5)

    n = step.warm_start()
    assert n >= 4, f"warm start dispatched only {n} programs"
    cache = pipe.bundle.__dict__["_jit_cache"]
    sizes = {k: v._cache_size() for k, v in cache.items()
             if k.startswith("unet_seg_")}
    assert sizes, "no chain programs were compiled by warm_start"

    out, _, _ = step(lat, key, inp)
    assert bool(jnp.isfinite(out).all())
    sizes_after = {k: v._cache_size() for k, v in cache.items()
                   if k.startswith("unet_seg_")}
    assert sizes_after == sizes, (
        "the real step recompiled warm-started programs (signature drift): "
        f"{sizes} -> {sizes_after}")


def test_warm_start_auto_mode_gate(monkeypatch):
    """warm_start's default mode='auto' must resolve per the headroom
    gate: 'exec' on CPU backends (tests and toy runs rely on the
    seated-dispatch-cache contract), 'aot' on non-CPU backends when
    ControlNet is resident — the configuration whose concurrent
    zero-executions OOMed the 16 GB chip (artifacts/CN_FLAGSHIP_r05.json).
    The backend is monkeypatched; the resolved mode is observed at the
    warm_unet_segmented seam."""
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.entry import make_denoise_step
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    b = make_toy_bundle(xl=True, controlnet="canny")
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", segmented_step="on")
    pipe = ElasticDiffusion(bundle=b, runtime=rt, verbose=False)
    dh, dw = pipe.get_downsample_size(32, 48)
    vsf = pipe.vae_scale_factor
    cond = jnp.asarray(np.random.RandomState(1)
                       .rand(1, 3, dh * vsf, dw * vsf).astype(np.float32))
    step, (lat, key, inp), _ = make_denoise_step(
        pipe, 32, 48, num_inference_steps=2, guidance_scale=7.5,
        resampling_steps=1, new_p=0.3, repaint=True, segmented=True,
        controlnet_cond=cond, controlnet_scale=0.5)

    seen = []
    real = b.warm_unet_segmented

    def spy(x, t, ctx, **kw):
        seen.append(kw.get("mode", "exec"))
        return real(x, t, ctx, **kw)

    monkeypatch.setattr(b, "warm_unet_segmented", spy)
    step.warm_start(inp)                       # CPU backend -> 'exec'
    assert seen and all(m == "exec" for m in seen), seen

    seen.clear()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    step.warm_start(inp)                       # CN resident off-CPU -> 'aot'
    assert seen and all(m == "aot" for m in seen), seen
