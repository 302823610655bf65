"""Reference-control-flow oracle pipeline (SURVEY §4.4 parity harness).

This transcribes the REFERENCE's orchestration exactly — Python loops, NaN
sentinel accumulation (/root/reference/elastic_diffusion.py:655), sequential
per-view UNet calls and in-place first-writer writeback (:830-862),
sequential background pad concat order (:366-391), autograd-equivalent RRG
gradient (:926-938) — while sharing the SAME model bundle and background
tables as the production pipeline. With identical injected randomness, the
jitted lax.fori_loop pipeline must reproduce this oracle's latents to fp32
accumulation tolerance. Test fixture, not product code.
"""

import numpy as np
import jax.numpy as jnp

import oracles


def _unet(bundle, x, t, ctx, pooled=None, tids=None):
    kwargs = {}
    if pooled is not None:
        kwargs = {"added_text_embeds": jnp.asarray(pooled),
                  "added_time_ids": jnp.asarray(np.broadcast_to(
                      tids, (x.shape[0], tids.shape[-1])))}
    out = bundle.apply_unet(jnp.asarray(x, jnp.float32), jnp.float32(t),
                            jnp.asarray(ctx, jnp.float32), **kwargs)
    return np.asarray(out, np.float32)


def _pad_background(x, pads, bgs):
    """(/root/reference/elastic_diffusion.py:366-391): W pads first (ids 3_*),
    then H pads over the padded width (ids 2_*)."""
    l, r, t, b = pads
    B = x.shape[0]
    rep = lambda a: np.broadcast_to(a[None], (B,) + a.shape)
    if l:
        x = np.concatenate([rep(bgs["3_1"]), x], axis=3)
    if r:
        x = np.concatenate([x, rep(bgs["3_2"])], axis=3)
    if t:
        x = np.concatenate([rep(bgs["2_1"]), x], axis=2)
    if b:
        x = np.concatenate([x, rep(bgs["2_2"])], axis=2)
    return x


def _unet_step(bundle, x, t, ctx, min_hw, bgs, pooled=None, tids=None):
    """(/root/reference/elastic_diffusion.py:393-432)"""
    h, w = x.shape[-2], x.shape[-1]
    h_p, w_p = max(min_hw - h, 0), max(min_hw - w, 0)
    l, r = w_p // 2, w_p - w_p // 2
    tp, bp = h_p // 2, h_p - h_p // 2
    if h_p or w_p:
        x = _pad_background(x, (l, r, tp, bp), bgs)
    eps = _unet(bundle, x, t, ctx, pooled, tids)
    if h_p or w_p:
        eps = eps[:, :, tp:eps.shape[-2] - bp, l:eps.shape[-1] - r]
    return eps


def _ddim_step(scheduler, state, i, eps, x):
    sa_t, s1a_t, sa_p, s1a_p = scheduler.step_coeffs(state, i)
    x0 = (x - s1a_t * eps) / sa_t
    prev = sa_p * x0 + s1a_p * eps
    return prev, x0


def reference_generate_latent(bundle, scheduler, state, *,
                              height, width, guidance_scale, resampling_steps,
                              drop_p, rrg_weights, repaint,
                              init_latent, picks_main, picks_repaint,
                              repaint_noises, bg_down, bg_view,
                              text_cfg, uncond_text, pooled_cfg=None,
                              uncond_pooled=None, tids=None,
                              window_size=None, context_size=None,
                              native_resolution=None):
    """Returns the final latent, following elastic_diffusion.py:1013-1078."""
    vsf = bundle.vae_scale_factor
    min_hw = bundle.config.min_latent_size
    H, W = height // vsf, width // vsf
    from elasticdiffusion_tpu.ops.resample import get_downsample_size
    down = get_downsample_size(height, width,
                               native_resolution or bundle.config.native_resolution,
                               vsf)
    lat = np.asarray(init_latent, np.float32)
    B = lat.shape[0]
    n_steps = state.num_inference_steps

    for i in range(n_steps):
        t = float(state.timesteps[i])
        bgd = {s: np.asarray(tbl[i]) for s, tbl in bg_down.items()}
        bgv = {s: np.asarray(tbl[i]) for s, tbl in bg_view.items()}

        def est(lat_, picks):
            nonlocal bgd, bgv
            target = np.full(lat_.shape, np.nan, np.float32)
            inf = {}
            for s in range(len(picks)):
                d, mask = oracles.random_nearest_downsample_given_indices(
                    lat_, down, picks[s])
                eps = _unet_step(bundle, np.concatenate([d, d]), t, text_cfg,
                                 min_hw, bgd, pooled_cfg, tids)
                eps_u, eps_c = eps[:B], eps[B:]
                dirn = eps_c - eps_u
                target = oracles.fill_in_nan(target, dirn, mask,
                                             fill_all=(s == len(picks) - 1))
                inf["downsampled_latent"] = d
                inf["uncond_score"] = eps_u
            inf["downsampled_direction"] = oracles.nearest_interpolate(target, down)
            return target, inf

        def loc(lat_):
            nonlocal bgv
            h_ws = w_ws = window_size
            if h_ws + context_size >= lat_.shape[2]:
                h_ws = lat_.shape[2]
            if w_ws + context_size >= lat_.shape[3]:
                w_ws = lat_.shape[3]
            views = oracles.get_views(H, W, h_ws, w_ws, window_size)
            out = np.zeros_like(lat_)
            for (a, b, c, d) in views:
                crop, (n_t, n_b, n_l, n_r) = oracles.crop_with_context(
                    lat_, a, b, c, d, S=1, n=context_size // 2)
                eps = _unet_step(bundle, crop, t, uncond_text, min_hw, bgv,
                                 uncond_pooled, tids)
                sh = (n_t, eps.shape[-2] - n_b)
                sw = (n_l, eps.shape[-1] - n_r)
                region = out[:, :, a:b, c:d]
                nz = region != 0
                src = eps[:, :, sh[0]:sh[1], sw[0]:sw[1]]
                region[~nz] = src[~nz]
            return out

        direction, info = est(lat, picks_main[i])
        local = loc(lat)
        pred = local + guidance_scale * direction
        prev, x0 = _ddim_step(scheduler, state, i, pred, lat)
        rrg_cfg = guidance_scale

        if repaint and resampling_steps > 0 and i < n_steps - 1:
            g = prev
            t_next = int(state.timesteps[i + 1])
            n_micro = state.config.num_train_timesteps // n_steps
            for m in range(n_micro):
                tt = t_next + m
                if tt >= state.config.num_train_timesteps:
                    continue
                beta = scheduler.betas[tt]
                g = np.sqrt(1 - beta) * g + np.sqrt(beta) * repaint_noises[i][m]
            lat = g.astype(np.float32)
            rrg_cfg = guidance_scale / 3
            direction, info = est(lat, picks_repaint[i])
            local = loc(lat)
            pred = local + rrg_cfg * direction
            prev, x0 = _ddim_step(scheduler, state, i, pred, lat)

        cascade = np.zeros_like(prev)
        if rrg_weights[i] > 10:
            noise_low = info["uncond_score"] + rrg_cfg * info["downsampled_direction"]
            prev_low, ref_x0 = _ddim_step(scheduler, state, i, noise_low,
                                          info["downsampled_latent"])
            ref_up = oracles.nearest_interpolate(ref_x0, (H, W))
            numel = x0.shape[1] * x0.shape[2] * x0.shape[3]
            cascade = 2.0 * rrg_weights[i] * (ref_up - x0) / numel
        lat = (prev + cascade).astype(np.float32)
    return lat
