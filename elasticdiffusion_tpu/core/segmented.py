"""Host-orchestrated segmented denoise step.

The default denoise step (core/pipeline._build_step_fn) is ONE jitted XLA
program containing every UNet forward of the step — the right design where
the compiler can take it (CPU, small models). This environment's remote XLA
compile service cannot compile full-SD-scale single programs (broken pipe
after ~1 h; see models/unet.py SEGMENTED EXECUTION), so at SD scale the
numerically identical step runs here as a HOST-ORCHESTRATED sequence:

  small jitted glue programs (pick/downsample/pad, fill/scatter, view
  gather/writeback, DDIM/repaint/RRG — each compiling in seconds)
  around the per-block segmented UNet chain (models/registry.py
  apply_unet_segmented — ~13 cached programs shared across all call
  sites of the step).

The RNG key threading mirrors core/signals.py draw-for-draw, so with the
same key this path and the fused path produce the same step output
(tested in tests/test_segmented.py). Phase boundaries double as per-phase
wall-clock probes (direction / views / scheduler+repaint+RRG), the honest
replacement for the reference's TimeIt totals
(/root/reference/elastic_diffusion.py:33-70) at SD scale on TPU.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from elasticdiffusion_tpu.core.background import (
    crop_from_padding, pad_with_background,
)
from elasticdiffusion_tpu.core.signals import DirectionResult, undo_step
from elasticdiffusion_tpu.ops.resample import (
    apply_resample, fill_in, mix_with_prev, sample_pick_indices,
    update_exclude_mask,
)
from elasticdiffusion_tpu.ops.resize import nearest_resize
from elasticdiffusion_tpu.ops.views import gather_views, scatter_first_writer
from elasticdiffusion_tpu.parallel.sharding import shard_views
from elasticdiffusion_tpu.sched.ddim import DDIMScheduler


def build_segmented_step(pipe, statics, text_cfg, uncond_text, add_text_cfg,
                         uncond_pooled, add_time_ids, repaint: bool,
                         scripted: bool = False, controlnet_cond=None,
                         controlnet_scale: float = 1.0):
    """Build a host-callable step(lat, key, inp) -> (next_lat, key, aux) with
    the same signature/semantics as pipeline._build_step_fn's closure.

    The returned callable has attributes:
      .phase_times  — {'direction': s, 'views': s, 'sched': s} accumulated
                      wall-clock when .collect_phase_times is True
      .collect_phase_times — enable per-phase device-synced timing (costs a
                      1-element device->host fetch per phase)
    """
    b = pipe.bundle
    cd = b.runtime.compute_dtype
    plan = statics.resample_plan
    vp = statics.view_plan
    N = plan.num_blocks
    V = vp.num_views
    H, W = statics.lat_h, statics.lat_w
    mesh = pipe.mesh
    gs = statics.guidance_scale

    # ------------------------------------------------------------------
    # builder-time constants: CFG-batched conditioning for the direction
    # pass (batch 2B) and views-batched conditioning for the local pass
    # (batch V*B) are fixed per generation, so they are computed once here
    # instead of inside the step (the fused path recomputes them per trace)
    # ------------------------------------------------------------------
    ctx_views = jnp.tile(uncond_text, (V, 1, 1))
    pooled_views = None if uncond_pooled is None else jnp.tile(uncond_pooled, (V, 1))

    cn_lowres_cfg = None
    cn_views = None
    if controlnet_cond is not None:
        # condition prepared at downsample_size*8 and nearest-resized
        # (/root/reference/elastic_diffusion_w_controlnet.py:1183-1193, 932-949)
        cond_lowres = nearest_resize(
            controlnet_cond,
            (statics.down_pad.out_shape[0] * b.vae_scale_factor,
             statics.down_pad.out_shape[1] * b.vae_scale_factor))
        cn_lowres_cfg = jnp.concatenate([cond_lowres, cond_lowres])
        vsf = b.vae_scale_factor
        rows = (np.repeat(vp.rows * vsf, vsf, axis=1)
                + np.tile(np.arange(vsf), vp.rows.shape[1]))
        cols = (np.repeat(vp.cols * vsf, vsf, axis=1)
                + np.tile(np.arange(vsf), vp.cols.shape[1]))

        @jax.jit
        def _gather_cn(cond):
            def one(r, c):
                return cond[:, :, r, :][:, :, :, c]
            cnv = jax.vmap(one)(jnp.asarray(rows), jnp.asarray(cols))
            return cnv.reshape((-1,) + cnv.shape[2:])
        cn_views = _gather_cn(controlnet_cond)

    def _unet(x_in, t, ctx, pooled, tids, cn_cond):
        kwargs = {}
        if pooled is not None:
            kwargs = {"added_text_embeds": pooled, "added_time_ids": tids}
        if cn_cond is not None:
            down, mid = _cn_jit(b.controlnet_params, x_in, t, ctx, cn_cond,
                                **kwargs)
            kwargs["down_block_residuals"] = down
            kwargs["mid_block_residual"] = mid
        return b.apply_unet_segmented(x_in, t, ctx, **kwargs)

    if controlnet_cond is not None:
        def _cn_fwd(params, x_in, t, ctx, cond, added_text_embeds=None,
                    added_time_ids=None):
            return b.controlnet.apply(
                {"params": params}, x_in, t, ctx, cond,
                conditioning_scale=controlnet_scale,
                added_text_embeds=added_text_embeds,
                added_time_ids=added_time_ids)
        _cn_jit = jax.jit(_cn_fwd)

    # ------------------------------------------------------------------
    # glue programs (each a small, fast-compiling jit)
    # ------------------------------------------------------------------

    @jax.jit
    def split4(key):
        return jax.random.split(key, 4)

    @jax.jit
    def dir_pre(lat, excl, prev, key, s, bg_down):
        """One resampling substep's pre-UNet work: pick sub-pixels, update the
        exclude mask, downsample, CFG-double, background-pad.
        Mirrors signals.approximate_latent_direction's substep draw-for-draw
        (/root/reference/elastic_diffusion.py:661-679)."""
        key, k_pick, k_drop = jax.random.split(key, 3)
        new_pick = sample_pick_indices(k_pick, excl, N)
        mixed = mix_with_prev(k_drop, new_pick, prev, statics.drop_p)
        pick = jnp.where(s == 0, jnp.zeros((N,), jnp.int32), mixed)
        excl = update_exclude_mask(excl, pick)
        down, mask = apply_resample(lat.astype(jnp.float32), plan, pick)
        x2 = jnp.concatenate([down, down]).astype(cd)
        x_in = pad_with_background(x2, statics.down_pad, bg_down)
        return x_in, down, mask, excl, pick, key

    @jax.jit
    def dir_pre_scripted(lat, excl, pick, bg_down):
        excl = update_exclude_mask(excl, pick)
        down, mask = apply_resample(lat.astype(jnp.float32), plan, pick)
        x2 = jnp.concatenate([down, down]).astype(cd)
        x_in = pad_with_background(x2, statics.down_pad, bg_down)
        return x_in, down, mask, excl

    @jax.jit
    def dir_post(target, filled, eps_pad, mask):
        """Post-UNet: crop padding, CFG split, scatter-fill, upsample."""
        eps = crop_from_padding(eps_pad, statics.down_pad).astype(jnp.float32)
        nB = eps.shape[0] // 2
        eps_u, eps_c = eps[:nB], eps[nB:]
        direction = eps_c - eps_u
        target, filled = fill_in(target, filled, direction, mask,
                                 fill_all=False)
        up = nearest_resize(direction, (H, W))
        return target, filled, eps_u, up

    @jax.jit
    def dir_finalize(target, filled, up_last):
        """fill_all (/root/reference/elastic_diffusion.py:681, 639-645)."""
        target = jnp.where(filled, target, up_last)
        down_dir = nearest_resize(target, (plan.out_h, plan.out_w))
        return target, down_dir

    @jax.jit
    def views_pre(lat, bg_view):
        views = gather_views(lat.astype(cd), vp)
        vb = views.reshape((-1,) + views.shape[2:])
        x_in = pad_with_background(vb, statics.view_pad, bg_view)
        return shard_views(x_in, mesh)

    @jax.jit
    def views_post(eps_pad):
        eps = crop_from_padding(eps_pad, statics.view_pad)
        preds = eps.reshape((V, -1) + eps.shape[1:]).astype(jnp.float32)
        return scatter_first_writer(preds, vp)

    @jax.jit
    def combine_ddim(local, direction, lat, coeffs, g):
        pred = local + g * direction
        return DDIMScheduler.step_from_coeffs(pred, lat.astype(jnp.float32),
                                              coeffs)

    @jax.jit
    def undo_jit(prev, key, s1mb, sb):
        return undo_step(prev, key, s1mb, sb)

    @jax.jit
    def undo_scripted_jit(prev, s1mb, sb, noise):
        return undo_step(prev, jax.random.PRNGKey(0), s1mb, sb,
                         scripted=noise)

    @jax.jit
    def rrg_apply(prev, x0, down_lat, eps_u, down_dir, g, rrg_w, coeffs):
        """Analytic RRG (signals.reduced_resolution_guidance)."""
        noise_low = eps_u + g * down_dir
        sa_t, s1a_t = coeffs[0], coeffs[1]
        ref_x0 = (down_lat - s1a_t * noise_low) / sa_t
        ref_up = nearest_resize(ref_x0, (x0.shape[-2], x0.shape[-1]))
        numel = x0.shape[1] * x0.shape[2] * x0.shape[3]
        cascade = 2.0 * rrg_w * (ref_up - x0) / numel
        nxt = prev + jnp.where(rrg_w > 10.0, cascade, jnp.zeros_like(cascade))
        return nxt, ref_x0

    # ------------------------------------------------------------------
    # host-orchestrated phases
    # ------------------------------------------------------------------

    def _approx_direction(lat, key, t, inp, n_sub, picks):
        bg_down = inp.get("bg_down", {})
        BB, C = lat.shape[0], lat.shape[1]
        target = jnp.zeros((BB, C, H, W), jnp.float32)
        filled = jnp.zeros((H, W), bool)
        excl = jnp.zeros((N, 4), bool)
        prev_pick = jnp.zeros((N,), jnp.int32)
        init_down = down = eps_u = up = None
        tid2 = None if add_time_ids is None else \
            jnp.broadcast_to(add_time_ids, (2 * BB,) + add_time_ids.shape[1:])
        for s in range(n_sub):
            if picks is not None:
                x_in, down, mask, excl = dir_pre_scripted(
                    lat, excl, jnp.asarray(picks[s]), bg_down)
            else:
                x_in, down, mask, excl, prev_pick, key = dir_pre(
                    lat, excl, prev_pick, key, jnp.int32(s), bg_down)
            eps_pad = _unet(x_in, t, text_cfg, add_text_cfg, tid2,
                            cn_lowres_cfg)
            target, filled, eps_u, up = dir_post(target, filled, eps_pad, mask)
            if s == 0:
                init_down = down
        target, down_dir = dir_finalize(target, filled, up)
        return DirectionResult(direction=target,
                               init_downsampled_latent=init_down,
                               downsampled_latent=down, uncond_score=eps_u,
                               downsampled_direction=down_dir), key

    def _local_signal(lat, t, inp):
        bg_view = inp.get("bg_view", {})
        BB = lat.shape[0]
        x_in = views_pre(lat, bg_view)
        # ctx_views = tile(uncond, (V,1,1)) is already (V*B, ...) in the same
        # V-major order as the view reshape (signals.py:204-207)
        tid = None if add_time_ids is None else \
            jnp.broadcast_to(add_time_ids, (V * BB,) + add_time_ids.shape[1:])
        eps_pad = _unet(x_in, t, ctx_views, pooled_views, tid, cn_views)
        return views_post(eps_pad)

    phase_times: Dict[str, float] = {}

    def _tick(label, t0, probe):
        if step.collect_phase_times:
            if probe is not None:
                # device-sync: 1-element fetch (block_until_ready does not
                # wait for execution on the tunnel backend; see bench.py)
                jax.device_get(probe.reshape(-1)[0])
            phase_times[label] = phase_times.get(label, 0.0) + time.time() - t0
        return time.time()

    def step(lat, key, inp):
        t = inp["t"]
        coeffs = inp["coeffs"]
        k_dir, k_rep_noise, k_rep_dir, key = split4(key)
        t0 = time.time()

        picks = inp.get("picks_main") if scripted else None
        res, _ = _approx_direction(lat, k_dir, t, inp, statics.resampling_steps + 1,
                                   picks)
        t0 = _tick("direction", t0, res.direction)
        local = _local_signal(lat, t, inp)
        t0 = _tick("views", t0, local)
        prev, x0 = combine_ddim(local, res.direction, lat, coeffs,
                                jnp.float32(gs))
        rrg_cfg = gs
        used = res

        if repaint:
            if scripted and inp.get("repaint_noise") is not None:
                lat2 = undo_scripted_jit(prev, inp["undo_s1mb"],
                                         inp["undo_sb"], inp["repaint_noise"])
            else:
                lat2 = undo_jit(prev, k_rep_noise, inp["undo_s1mb"],
                                inp["undo_sb"])
            t0 = _tick("sched", t0, lat2)
            picks2 = inp.get("picks_repaint") if scripted else None
            res2, _ = _approx_direction(lat2, k_rep_dir, t, inp, 1, picks2)
            t0 = _tick("direction", t0, res2.direction)
            local2 = _local_signal(lat2, t, inp)
            t0 = _tick("views", t0, local2)
            rrg_cfg = gs / 3
            prev, x0 = combine_ddim(local2, res2.direction, lat2, coeffs,
                                    jnp.float32(rrg_cfg))
            used = res2

        nxt, ref_x0 = rrg_apply(prev, x0, used.downsampled_latent,
                                used.uncond_score, used.downsampled_direction,
                                jnp.float32(rrg_cfg), inp["rrg_w"], coeffs)
        _tick("sched", t0, nxt)
        aux = {"x0": x0, "rrg_x0": ref_x0,
               "init_downsampled_latent": res.init_downsampled_latent}
        return nxt, key, aux

    step.collect_phase_times = False
    step.phase_times = phase_times
    return step


def should_segment(runtime, bundle_config) -> bool:
    """Decide whether generate_image should run the host-orchestrated step.

    'auto': segment on non-CPU backends for SD-scale models (the remote XLA
    compile service cannot build full-SD single-step programs; toy/test
    models compile fused in seconds and keep the fully-jitted fast path).
    """
    mode = getattr(runtime, "segmented_step", "auto")
    if mode in ("on", True):
        return True
    if mode in ("off", False):
        return False
    return (jax.default_backend() not in ("cpu",)
            and max(bundle_config.unet.block_out_channels) >= 640)
