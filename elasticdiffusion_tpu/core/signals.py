"""Signal estimators: the ElasticDiffusion algorithm as pure jittable functions.

Reference behavior (SURVEY L5):
  - unet_step (pad->UNet->crop)            /root/reference/elastic_diffusion.py:393-432
  - obtain_latent_direction (CFG pair)     :434-443
  - approximate_latent_direction_w_resampling :649-690
  - compute_local_uncond_signal            :813-864
  - reduced_resolution_guidance            :885-940 (autograd -> analytic)
  - undo_step / repaint                    :692-704, 1038-1056

TPU-first design notes:
  - the resampling substeps' only sequential dependence is the RNG/exclude
    -mask pick chain; all 2*(rs+1) CFG forwards run as ONE batched UNet
    call (see approximate_latent_direction), shardable over the mesh
  - the view loop is ONE batched UNet call over all views (shardable on the
    'views' mesh axis) + owner-map writeback; view_batch_size survives only
    as a lax.map memory knob
  - RRG's autograd is replaced by the closed form
    2*rrg_scale*(up(ref_x0) - x0)/numel (SURVEY §7.1.4)
  - every random draw can be overridden by a ScriptedNoise pytree so parity
    harnesses can inject recorded randomness through the REAL jitted path
    (SURVEY §7.3.1)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from elasticdiffusion_tpu.core.background import (
    PadSpec, crop_from_padding, pad_with_background,
)
from elasticdiffusion_tpu.ops.resample import (
    ResamplePlan, apply_resample, fill_in, mix_with_prev, sample_pick_indices,
    update_exclude_mask,
)
from elasticdiffusion_tpu.ops.resize import nearest_resize
from elasticdiffusion_tpu.ops.views import (
    ViewPlan, gather_views, scatter_first_writer,
)
from elasticdiffusion_tpu.parallel.sharding import (
    pad_and_shard_views, pad_rows_to_mesh, replicate_mesh, shard_views,
)


class ScriptedNoise(NamedTuple):
    """Optional recorded randomness for parity testing. Any field may be None.

    picks:  (rs+1, N) int32 — final per-substep block picks (overrides the
            exclude/drop machinery entirely, like injecting the reference's
            random_indices)
    repaint:(n_micro, B, C, H, W) — repaint re-noising draws
    """

    picks: Optional[jnp.ndarray] = None
    repaint: Optional[jnp.ndarray] = None


@dataclass(frozen=True)
class UNetCallConfig:
    """Static context for one unet_step shape."""

    pad_spec: PadSpec
    is_xl: bool


def unet_step(bundle, x, t, context, pad_spec: PadSpec, step_bgs,
              add_text_embeds=None, add_time_ids=None,
              controlnet_cond=None, controlnet_scale: float = 1.0):
    """scale_model_input (identity) -> background pad -> UNet -> crop
    (/root/reference/elastic_diffusion.py:393-432). x: (B', C, h, w)."""
    x_in = pad_with_background(x, pad_spec, step_bgs)
    kwargs = {}
    if add_text_embeds is not None:
        kwargs = {"added_text_embeds": add_text_embeds,
                  "added_time_ids": add_time_ids}
    if controlnet_cond is not None:
        down, mid = bundle.apply_controlnet(
            x_in, t, context, controlnet_cond,
            conditioning_scale=controlnet_scale, **kwargs)
        kwargs["down_block_residuals"] = down
        kwargs["mid_block_residual"] = mid
    eps = bundle.apply_unet(x_in, t, context, **kwargs)
    return crop_from_padding(eps, pad_spec)


def obtain_latent_direction(bundle, latent, t, text_embeds_cfg, pad_spec,
                            step_bgs, add_text_embeds_cfg=None,
                            add_time_ids=None, controlnet_cond=None,
                            controlnet_scale: float = 1.0):
    """CFG pair in one batched call (/root/reference/elastic_diffusion.py:434-443).

    text_embeds_cfg: (2B, 77, D) stacked [uncond; cond].
    Returns (direction, uncond_eps, cond_eps), all fp32.
    """
    B = latent.shape[0]
    x2 = jnp.concatenate([latent, latent]).astype(bundle.runtime.compute_dtype)
    cn = None
    if controlnet_cond is not None:
        cn = jnp.concatenate([controlnet_cond, controlnet_cond])
    tid = None
    if add_time_ids is not None:
        tid = jnp.broadcast_to(add_time_ids, (2 * B,) + add_time_ids.shape[1:])
    eps = unet_step(bundle, x2, t, text_embeds_cfg, pad_spec, step_bgs,
                    add_text_embeds=add_text_embeds_cfg, add_time_ids=tid,
                    controlnet_cond=cn, controlnet_scale=controlnet_scale)
    eps = eps.astype(jnp.float32)
    eps_u, eps_c = eps[:B], eps[B:]
    return eps_c - eps_u, eps_u, eps_c


def resolve_resample_picks(key, n_sub: int, num_blocks: int, drop_p: float,
                           scripted_picks=None) -> jnp.ndarray:
    """The resampling loop's ONLY sequential dependence: the RNG/exclude-mask
    pick chain (/root/reference/elastic_diffusion.py:661-675). Returns all
    substeps' picks (n_sub, N) so the UNet work can run as one batch.
    Key-split order matches the original per-substep loop draw-for-draw."""
    if scripted_picks is not None:
        return jnp.asarray(scripted_picks)[:n_sub]

    def body(s, carry):
        excl, prev, key, picks = carry
        key, k_pick, k_drop = jax.random.split(key, 3)
        new_pick = sample_pick_indices(k_pick, excl, num_blocks)
        mixed = mix_with_prev(k_drop, new_pick, prev, drop_p)
        pick = jnp.where(s == 0, jnp.zeros((num_blocks,), jnp.int32), mixed)
        excl = update_exclude_mask(excl, pick)
        return excl, pick, key, picks.at[s].set(pick)

    _, _, _, picks = jax.lax.fori_loop(
        0, n_sub, body,
        (jnp.zeros((num_blocks, 4), bool), jnp.zeros((num_blocks,), jnp.int32),
         key, jnp.zeros((n_sub, num_blocks), jnp.int32)))
    return picks


class DirectionResult(NamedTuple):
    direction: jnp.ndarray           # (B, C, H, W) fp32, fully filled
    init_downsampled_latent: jnp.ndarray
    downsampled_latent: jnp.ndarray  # last resampling substep's input
    uncond_score: jnp.ndarray        # last substep's uncond eps (low-res)
    downsampled_direction: jnp.ndarray  # nearest-downsample of final direction


def approximate_latent_direction(bundle, latent, key, t, text_embeds_cfg,
                                 plan: ResamplePlan, pad_spec: PadSpec,
                                 step_bgs, resampling_steps: int, drop_p: float,
                                 add_text_embeds_cfg=None, add_time_ids=None,
                                 scripted_picks=None, controlnet_cond=None,
                                 controlnet_scale: float = 1.0,
                                 mesh=None) -> DirectionResult:
    """Global CFG direction with randomized resampling
    (/root/reference/elastic_diffusion.py:649-690).

    Substep 0 uses the deterministic nearest pick (fix_initial); later
    substeps sample fresh sub-pixels avoiding the exclude mask and keep the
    previous pick with probability drop_p.

    TPU-first restructure: the reference runs the substeps as a sequential
    loop, but the only true sequential dependence is the RNG/exclude-mask
    chain — the UNet inputs are all downsamples of the SAME latent
    (reference line 665: `random_nearest_downsample(latent, ...)` inside the
    loop never sees UNet outputs). So: (1) a cheap fori_loop derives every
    substep's pick, (2) ONE CFG-batched UNet call of batch 2*(rs+1)*B
    evaluates all substeps (MXU-efficient and shardable over the mesh),
    (3) a cheap fori_loop applies the fills in substep order. Draw-for-draw
    identical randomness and fill order to the sequential form.
    """
    B, C, H, W = latent.shape
    N = plan.num_blocks
    n_sub = resampling_steps + 1
    # replicated gather operand (see parallel/sharding.replicate_mesh:
    # data-sharded latent -> views-sharded batch would involuntarily remat)
    latent32 = replicate_mesh(latent, mesh).astype(jnp.float32)

    if controlnet_cond is not None:
        # condition arrives prepared at downsample_size*8
        # (w_controlnet.py:1183-1193) and is ZERO-padded alongside the
        # latent's background padding (w_controlnet.py:457-462)
        vsf = bundle.vae_scale_factor
        l, r, tp, bp = pad_spec.pads
        cond_lowres = jnp.pad(
            controlnet_cond,
            ((0, 0), (0, 0), (tp * vsf, bp * vsf), (l * vsf, r * vsf)))
    else:
        cond_lowres = None

    picks = resolve_resample_picks(key, n_sub, N, drop_p, scripted_picks)

    # batched downsample: (n_sub, B, C, dh, dw), masks (n_sub, H, W)
    downs, masks = jax.vmap(lambda p: apply_resample(latent32, plan, p))(picks)

    # ONE CFG-batched UNet call over all substeps: layout
    # [uncond s0..s{n-1} | cond s0..s{n-1}], each block batch n_sub*B
    dh, dw = plan.out_h, plan.out_w
    flat = downs.reshape(n_sub * B, C, dh, dw)
    x2 = jnp.concatenate([flat, flat]).astype(bundle.runtime.compute_dtype)
    # pad to the mesh width so P('views') engages at any substep batch
    # (silent replication at non-divisible batches; VERDICT r2 weak #1)
    x2 = pad_and_shard_views(x2, mesh)
    uncond, cond = text_embeds_cfg[:B], text_embeds_cfg[B:]
    ctx = jnp.concatenate([jnp.tile(uncond, (n_sub, 1, 1)),
                           jnp.tile(cond, (n_sub, 1, 1))])
    ctx = pad_rows_to_mesh(ctx, mesh)
    ate = None
    if add_text_embeds_cfg is not None:
        au, ac = add_text_embeds_cfg[:B], add_text_embeds_cfg[B:]
        ate = jnp.concatenate([jnp.tile(au, (n_sub, 1)),
                               jnp.tile(ac, (n_sub, 1))])
        ate = pad_rows_to_mesh(ate, mesh)
    tid = None
    if add_time_ids is not None:
        tid = jnp.broadcast_to(add_time_ids,
                               (2 * n_sub * B,) + add_time_ids.shape[1:])
        tid = pad_rows_to_mesh(tid, mesh)
    cn = None
    if cond_lowres is not None:
        cn = jnp.concatenate([jnp.tile(cond_lowres, (n_sub, 1, 1, 1))] * 2)
        cn = pad_rows_to_mesh(cn, mesh)
    eps = unet_step(bundle, x2, t, ctx, pad_spec, step_bgs,
                    add_text_embeds=ate, add_time_ids=tid,
                    controlnet_cond=cn, controlnet_scale=controlnet_scale)
    eps = eps[:2 * n_sub * B].astype(jnp.float32)  # drop mesh-pad rows
    eps_u = eps[:n_sub * B].reshape(n_sub, B, C, dh, dw)
    eps_c = eps[n_sub * B:].reshape(n_sub, B, C, dh, dw)
    directions = eps_c - eps_u                      # (n_sub, B, C, dh, dw)

    # ordered fills (cheap gathers; later substeps overwrite on overlap,
    # exactly the reference's sequential semantics)
    def fill_body(s, carry):
        target, filled = carry
        return fill_in(target, filled, directions[s], masks[s],
                       fill_all=False)
    target, filled = jax.lax.fori_loop(
        0, n_sub, fill_body,
        (jnp.zeros((B, C, H, W), jnp.float32), jnp.zeros((H, W), bool)))

    # fill_all at the final substep (/root/reference/elastic_diffusion.py:681,
    # 639-645): remaining unfilled positions take the last upsampled direction
    up_last = nearest_resize(directions[-1], (H, W))
    target = jnp.where(filled, target, up_last)
    down_dir = nearest_resize(target, (dh, dw))
    return DirectionResult(direction=target,
                           init_downsampled_latent=downs[0],
                           downsampled_latent=downs[-1],
                           uncond_score=eps_u[-1],
                           downsampled_direction=down_dir)


def compute_local_uncond_signal(bundle, latent, t, uncond_embeds, plan: ViewPlan,
                                pad_spec: PadSpec, step_bgs,
                                uncond_pooled=None, add_time_ids=None,
                                view_batch_size: int = 0,
                                mesh=None, controlnet_cond=None,
                                controlnet_scale: float = 1.0):
    """Local unconditional score over patch views
    (/root/reference/elastic_diffusion.py:813-864).

    One batched UNet call over all V views (optionally chunked with lax.map
    as a memory knob, or sharded over the 'views' mesh axis).
    """
    B = latent.shape[0]
    V = plan.num_views
    # replicated gather operand (see parallel/sharding.replicate_mesh)
    latent = replicate_mesh(latent, mesh)
    views = gather_views(latent.astype(bundle.runtime.compute_dtype), plan)
    vb = views.reshape((V * B,) + views.shape[2:])
    ctx = jnp.tile(uncond_embeds, (V, 1, 1))
    pooled = None if uncond_pooled is None else jnp.tile(uncond_pooled, (V, 1))
    tid = None if add_time_ids is None else \
        jnp.broadcast_to(add_time_ids, (V * B,) + add_time_ids.shape[1:])

    cn_views = None
    if controlnet_cond is not None:
        # low-res condition nearest-UPSAMPLED to full pixel res
        # (w_controlnet.py:932-933, batch[0:1] broadcast over B), then
        # cropped per view at 8x latent coords (w_controlnet.py:946-949):
        # one gather with the view plan scaled to pixels
        vsf = bundle.vae_scale_factor
        H, W = latent.shape[-2], latent.shape[-1]
        cond_up = nearest_resize(controlnet_cond[:1], (H * vsf, W * vsf))
        cond_up = jnp.broadcast_to(cond_up, (B,) + cond_up.shape[1:])
        rows = (np.repeat(plan.rows * vsf, vsf, axis=1)
                + np.tile(np.arange(vsf), plan.rows.shape[1]))
        cols = (np.repeat(plan.cols * vsf, vsf, axis=1)
                + np.tile(np.arange(vsf), plan.cols.shape[1]))
        def one(r, c):
            return cond_up[:, :, r, :][:, :, :, c]
        cnv = jax.vmap(one)(jnp.asarray(rows), jnp.asarray(cols))
        cn_views = cnv.reshape((V * B,) + cnv.shape[2:])

    def run(xs):
        return unet_step(bundle, xs["x"], t, xs["ctx"], pad_spec, step_bgs,
                         add_text_embeds=xs.get("pooled"),
                         add_time_ids=xs.get("tid"),
                         controlnet_cond=xs.get("cn"),
                         controlnet_scale=controlnet_scale)

    xs = {"x": vb, "ctx": ctx}
    if pooled is not None:
        xs["pooled"] = pooled
    if tid is not None:
        xs["tid"] = tid
    if cn_views is not None:
        xs["cn"] = cn_views

    if view_batch_size and view_batch_size < V and V % view_batch_size == 0:
        # memory knob: sequential chunks via lax.map (the reference's
        # view_batch_size loop, elastic_diffusion.py:830-831)
        n_chunks = V // view_batch_size
        xs = {k: a.reshape((n_chunks, -1) + a.shape[1:]) for k, a in xs.items()}
        preds = jax.lax.map(run, xs)
        preds = preds.reshape((V * B,) + preds.shape[2:])
    else:
        # shard the whole view batch across the mesh in one call, padded to
        # the mesh width so the spec engages at any V*B
        xs = {k: pad_and_shard_views(a, mesh) for k, a in xs.items()}
        preds = run(xs)[:V * B]

    preds = preds.reshape((V, B) + preds.shape[1:]).astype(jnp.float32)
    preds = shard_views(preds, mesh)
    return scatter_first_writer(preds, plan)


def reduced_resolution_guidance(x0_full, downsampled_latent, uncond_score,
                                downsampled_direction, guidance_scale,
                                rrg_scale, ddim_coeffs):
    """Analytic RRG gradient (/root/reference/elastic_diffusion.py:885-940;
    SURVEY §7.1.4): low-res DDIM x0 from cached scores, nearest-upsampled,
    pulled toward with d/dx0 [rrg_scale * MSE] sign-flipped:
        cascade = 2 * rrg_scale * (up(ref_x0) - x0) / numel
    """
    noise_low = uncond_score + guidance_scale * downsampled_direction
    _, ref_x0 = _ddim_from_coeffs(noise_low, downsampled_latent, ddim_coeffs)
    ref_up = nearest_resize(ref_x0, (x0_full.shape[-2], x0_full.shape[-1]))
    numel = x0_full.shape[1] * x0_full.shape[2] * x0_full.shape[3]
    return 2.0 * rrg_scale * (ref_up - x0_full) / numel, ref_x0


def _ddim_from_coeffs(model_output, sample, coeffs):
    sa_t, s1a_t, sa_p, s1a_p = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    x0 = (sample - s1a_t * model_output) / sa_t
    prev = sa_p * x0 + s1a_p * model_output
    return prev, x0


def undo_step(sample, key, sqrt_1m_betas, sqrt_betas, scripted=None):
    """Repaint re-noising (/root/reference/elastic_diffusion.py:692-704):
    n sequential micro-steps with fresh noise each."""
    n = sqrt_1m_betas.shape[0]

    def body(i, carry):
        x, key = carry
        key, k = jax.random.split(key)
        noise = scripted[i] if scripted is not None else \
            jax.random.normal(k, x.shape, dtype=x.dtype)
        return (sqrt_1m_betas[i] * x + sqrt_betas[i] * noise, key)

    x, _ = jax.lax.fori_loop(0, n, body, (sample, key))
    return x
