"""Standalone denoise-step builder for drivers/benchmarks.

Builds the same jittable step closure `generate_image` uses internally, plus
example inputs, without running a full generation — used by __graft_entry__
(compile checks, multi-chip dry runs) and bench.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from elasticdiffusion_tpu.core.background import PadSpec, make_background_table
from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion, _StepStatics
from elasticdiffusion_tpu.ops.resample import build_resample_plan
from elasticdiffusion_tpu.ops.views import build_view_plan


def make_denoise_step(pipe: ElasticDiffusion, height: int, width: int,
                      num_inference_steps: int = 50,
                      guidance_scale: float = 10.0, resampling_steps: int = 7,
                      new_p: float = 0.3, repaint: bool = True,
                      prompt: str = "a photo", negative: str = "",
                      segmented: bool = False, controlnet_cond=None,
                      controlnet_scale: float = 1.0):
    """Returns (step_fn, (latent, key, inp)) for ONE denoise step at step 0.

    With segmented=False, step_fn is the un-jitted fused closure (callers
    decide how to jit/shard it). With segmented=True, step_fn is the
    host-orchestrated segmented step (core/segmented.py) — call it directly,
    do NOT wrap it in jax.jit.
    """
    b = pipe.bundle
    vsf = pipe.vae_scale_factor
    lat_h, lat_w = height // vsf, width // vsf
    dh, dw = pipe.get_downsample_size(height, width)
    resample_plan = build_resample_plan(lat_h, lat_w, dh, dw)
    dh, dw = resample_plan.out_h, resample_plan.out_w
    view_plan = build_view_plan(lat_h, lat_w, pipe.view_config)
    m = b.config.min_latent_size
    down_pad = PadSpec(dh, dw, m, m)
    view_pad = PadSpec(*view_plan.out_shape, m, m)
    statics = _StepStatics(
        height=height, width=width, lat_h=lat_h, lat_w=lat_w, down_h=dh,
        down_w=dw, resample_plan=resample_plan, view_plan=view_plan,
        down_pad=down_pad, view_pad=view_pad, guidance_scale=guidance_scale,
        resampling_steps=resampling_steps, drop_p=1 - new_p,
        is_xl=b.config.is_xl)

    st = pipe.scheduler.set_timesteps(num_inference_steps)
    coeffs = pipe.scheduler.coeff_tables(st)

    uncond_text, uncond_pooled = pipe.get_text_embeds([negative])
    cond_text, cond_pooled = pipe.get_text_embeds([prompt])
    text_cfg = jnp.concatenate([uncond_text, cond_text])
    add_text_cfg = None
    add_time_ids = None
    uncond_pooled_arg = None
    if b.config.is_xl:
        add_text_cfg = jnp.concatenate([uncond_pooled, cond_pooled])
        add_time_ids = pipe._get_add_time_ids((4 * height, 4 * width), (0, 0),
                                              (4 * height, 4 * width))
        uncond_pooled_arg = uncond_pooled

    key = jax.random.PRNGKey(0)
    ts0 = st.timesteps[:1]
    bg_down = make_background_table(b, ts0, down_pad, key, pipe.scheduler) \
        if down_pad.needs_padding else {}
    bg_view = make_background_table(b, ts0, view_pad, key, pipe.scheduler) \
        if view_pad.needs_padding else {}

    inp = {"t": jnp.float32(float(st.timesteps[0])),
           "coeffs": jnp.asarray(coeffs[0]),
           "rrg_w": jnp.float32(1000.0),
           "bg_down": {s: t[0] for s, t in bg_down.items()},
           "bg_view": {s: t[0] for s, t in bg_view.items()}}
    if repaint and resampling_steps > 0:
        s1mb, sb = pipe.scheduler.undo_step_coeffs(st, int(st.timesteps[1]))
        inp["undo_s1mb"] = jnp.asarray(s1mb)
        inp["undo_sb"] = jnp.asarray(sb)

    if segmented:
        from elasticdiffusion_tpu.core.segmented import build_segmented_step
        step_fn = build_segmented_step(
            pipe, statics, text_cfg, uncond_text, add_text_cfg,
            uncond_pooled_arg, add_time_ids,
            repaint=repaint and resampling_steps > 0, scripted=False,
            controlnet_cond=controlnet_cond,
            controlnet_scale=controlnet_scale)
    else:
        # _build_step_fn returns a raw closure; callers jit it
        jitted = pipe._build_step_fn(statics, text_cfg, uncond_text,
                                     add_text_cfg, uncond_pooled_arg,
                                     add_time_ids,
                                     repaint=repaint and resampling_steps > 0,
                                     scripted=False)
        step_fn = jitted.__wrapped__ if hasattr(jitted, "__wrapped__") else jitted

    lat = jax.random.normal(jax.random.fold_in(key, 3),
                            (1, b.in_channels, lat_h, lat_w), jnp.float32)
    return step_fn, (lat, jax.random.PRNGKey(1), inp), view_plan
