"""ElasticDiffusion pipeline — public API mirroring the reference
(/root/reference/elastic_diffusion.py:111-163, 952-1130; SURVEY Appendix A).

TPU-first architecture (SURVEY §7.1):
  - one fully-jitted denoise step per (resolution, config): direction
    resampling (lax.fori_loop of CFG-batched UNet calls), one batched
    view pass, repaint re-estimation, analytic RRG — all inside jit
  - the timestep loop is a host loop over the jitted step by default
    (progress/logging/latent-checkpointing), or a single lax.scan when
    RuntimeConfig.fused_loop is set; per-step constants (DDIM coeffs, RRG
    weights, backgrounds) are precomputed tables
  - background pads precomputed per (shape, t) before the loop (no VAE
    bouncing, SURVEY §7.1.5)
  - patch views shard over the 'views' axis of a jax.sharding.Mesh
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from elasticdiffusion_tpu.configs import (
    GenerationConfig, RuntimeConfig, ViewConfig,
)
from elasticdiffusion_tpu.core.background import PadSpec, make_background_table
from elasticdiffusion_tpu.core import signals
from elasticdiffusion_tpu.models.registry import ModelBundle, load_bundle
from elasticdiffusion_tpu.ops.resample import (
    build_resample_plan, get_downsample_size,
)
from elasticdiffusion_tpu.ops.views import build_view_plan
from elasticdiffusion_tpu.parallel.sharding import make_mesh, put_replicated
from elasticdiffusion_tpu.sched.ddim import DDIMScheduler
from elasticdiffusion_tpu.sched.weight_schedulers import (
    CosineScheduler, make_rrg_scheduler, rrg_weight_table,
)
from elasticdiffusion_tpu.utils.image import (make_grid, to_pil,
                                              to_pil_device)
from elasticdiffusion_tpu.utils.timeit import timelog


@dataclass
class _StepStatics:
    """Everything shape-defining for one generate() call."""

    height: int
    width: int
    lat_h: int
    lat_w: int
    down_h: int
    down_w: int
    resample_plan: Any
    view_plan: Any
    down_pad: PadSpec
    view_pad: PadSpec
    guidance_scale: float
    resampling_steps: int
    drop_p: float
    is_xl: bool


class ElasticDiffusion:
    """Drop-in equivalent of the reference class. `device` is accepted for
    API parity but ignored (JAX owns device placement; use RuntimeConfig
    mesh_shape for multi-chip).

    Documented deviation: `view_batch_size` defaults to 0 = "one whole
    batched call" rather than the reference's 1 (a conservative GPU-memory
    default that loops views one at a time,
    /root/reference/elastic_diffusion.py:830-831). On TPU the whole-batch
    dispatch is both faster and fits; set 0 < view_batch_size < num_views
    to chunk views as a memory knob (honored by BOTH the fused and the
    segmented production step — numerically identical either way)."""

    def __init__(self, device=None, sd_version: str = "2.0",
                 verbose: bool = False, log_freq: int = 5,
                 view_batch_size: int = 0, low_vram: bool = False,
                 checkpoint_dir: Optional[str] = None,
                 controlnet_model: Optional[str] = None,
                 tokenizer_dirs=None,
                 runtime: Optional[RuntimeConfig] = None,
                 bundle: Optional[ModelBundle] = None,
                 mesh=None):
        self.sd_version = sd_version
        self.verbose = verbose
        self.log_freq = log_freq
        self.view_batch_size = view_batch_size
        self.low_vram = low_vram
        if runtime is None:
            # inherit the bundle's runtime when one is supplied — otherwise a
            # caller-configured bundle (e.g. segmented_step="on") would be
            # silently overridden by a fresh default config
            runtime = bundle.runtime if bundle is not None \
                else RuntimeConfig(remat_unet=low_vram)
        self.runtime = runtime
        if bundle is None:
            bundle = load_bundle(sd_version, runtime=runtime,
                                 checkpoint_dir=checkpoint_dir,
                                 controlnet_model=controlnet_model,
                                 tokenizer_dirs=tokenizer_dirs)
        self.bundle = bundle
        self.controlnet_model = controlnet_model
        self.scheduler = DDIMScheduler()
        self.vae_scale_factor = bundle.vae_scale_factor
        self.set_view_config()
        self.mesh = mesh if mesh is not None else make_mesh(
            runtime.mesh_shape, runtime.mesh_axis_names)
        if self.mesh is not None:
            self.bundle.unet_params = put_replicated(bundle.unet_params, self.mesh)
        self._base_key = jax.random.PRNGKey(0)
        self._step_cache: Dict[Any, Any] = {}
        # instrumentation: UNet view-forwards of the last generate call
        self.last_metrics: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    # reference API surface
    # ------------------------------------------------------------------

    def set_view_config(self, patch_size: Optional[int] = None):
        """(/root/reference/elastic_diffusion.py:159-163)"""
        self.view_config = ViewConfig.from_sample_size(
            self.bundle.sample_size, patch_size)

    def seed_everything(self, seed: int, seed_np: bool = True):
        """(/root/reference/elastic_diffusion.py:165-171) — functional analog:
        resets the base PRNG key all downstream draws derive from."""
        self._base_key = jax.random.PRNGKey(seed)
        if seed_np:
            np.random.seed(seed)

    def get_downsample_size(self, H: int, W: int) -> Tuple[int, int]:
        return get_downsample_size(H, W, self.bundle.config.native_resolution,
                                   self.vae_scale_factor)

    # ------------------------------------------------------------------
    # text encoding (/root/reference/elastic_diffusion.py:248-265)
    # ------------------------------------------------------------------

    def get_text_embeds(self, prompts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = self.bundle
        if b.config.is_xl:
            ids0 = b.tokenizers[0](prompts)
            ids1 = b.tokenizers[1](prompts)
            _, pen0, _ = b.encode_text(ids0, 0)
            _, pen1, pooled = b.encode_text(ids1, 1)
            text = jnp.concatenate([pen0, pen1], axis=-1)
            return text.astype(jnp.float32), pooled.astype(jnp.float32)
        ids = b.tokenizers[0](prompts)
        last, _, _ = b.encode_text(ids, 0)
        return last.astype(jnp.float32), last.astype(jnp.float32)

    def _get_add_time_ids(self, original_size, crops_coords_top_left,
                          target_size) -> jnp.ndarray:
        """SDXL micro-conditioning ids (/root/reference/elastic_diffusion.py:232-246)."""
        ids = list(original_size) + list(crops_coords_top_left) + list(target_size)
        return jnp.asarray([ids], dtype=jnp.float32)

    # ------------------------------------------------------------------
    # decoding (/root/reference/elastic_diffusion.py:267-310)
    # ------------------------------------------------------------------

    def decode_latents(self, latents) -> jnp.ndarray:
        img = self.bundle.vae_decode(
            latents.astype(jnp.float32) / self.bundle.config.vae.scaling_factor)
        return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    def halo_decode(self, latents) -> jnp.ndarray:
        """Seam-free halo tiled decode (parallel/halo_decode.py): exact equal
        to monolithic decode, sharded over the mesh when present."""
        from elasticdiffusion_tpu.parallel.halo_decode import halo_decode
        img = halo_decode(
            self.bundle,
            latents.astype(jnp.float32) / self.bundle.config.vae.scaling_factor,
            mesh=self.mesh)
        return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    def tiled_decode(self, latents) -> jnp.ndarray:
        """Overlap-average tiled decode (/root/reference/elastic_diffusion.py:275-310).
        (The halo decoder above supersedes this — exact, seam-free — and is
        used for tiled_decoder=True unless use_halo_decode is disabled; this
        is the reference-parity path.)"""
        from elasticdiffusion_tpu.ops.views import get_views_latent
        b = self.bundle
        B, C, lh, lw = latents.shape
        vsf = self.vae_scale_factor
        H, W = lh * vsf, lw * vsf
        sample = b.sample_size
        core = sample // 4
        stride = core
        pad = sample // vsf * 3
        if self.low_vram:
            stride = core // 2
            pad = core
        views = get_views_latent(lh, lw, core, core, stride)
        padded = jnp.pad(latents, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        image = jnp.zeros((B, 3, H, W), jnp.float32)
        count = jnp.zeros((B, 3, H, W), jnp.float32)
        p = pad * vsf
        for (a, bb, c, d) in views:
            tile = padded[:, :, a:bb + 2 * pad, c:d + 2 * pad]
            dec = self.decode_latents(tile)
            core_px = dec[:, :, p:dec.shape[2] - p, p:dec.shape[3] - p]
            ys, xs = a * vsf, c * vsf
            image = image.at[:, :, ys:ys + core_px.shape[2],
                             xs:xs + core_px.shape[3]].add(core_px)
            count = count.at[:, :, ys:ys + core_px.shape[2],
                             xs:xs + core_px.shape[3]].add(1.0)
        return image / count

    # ------------------------------------------------------------------
    # vanilla sampling (/root/reference/elastic_diffusion.py:760-796)
    # ------------------------------------------------------------------

    def generate(self, latent, text_embeds_cfg, add_text_embeds_cfg=None,
                 guidance_scale: float = 7.5, num_inference_steps: int = 50,
                 add_time_ids=None, bg_tables=None, pad_spec=None,
                 state=None):
        """Plain CFG DDIM sampling of a (low-res) latent. Returns
        (image [0,1], {'inter_x0': [...]})"""
        b = self.bundle
        st = state or self.scheduler.set_timesteps(num_inference_steps)
        if pad_spec is None:
            pad_spec = PadSpec(latent.shape[-2], latent.shape[-1],
                               b.config.min_latent_size, b.config.min_latent_size)
        if bg_tables is None and pad_spec.needs_padding:
            bg_tables = make_background_table(b, st.timesteps, pad_spec,
                                              jax.random.fold_in(self._base_key, 7),
                                              self.scheduler)
        coeff_table = self.scheduler.coeff_tables(st)

        @jax.jit
        def step(lat, t, coeffs, bgs):
            direction, eps_u, _ = signals.obtain_latent_direction(
                b, lat, t, text_embeds_cfg, pad_spec, bgs,
                add_text_embeds_cfg=add_text_embeds_cfg,
                add_time_ids=add_time_ids)
            pred = eps_u + guidance_scale * direction
            prev, x0 = DDIMScheduler.step_from_coeffs(
                pred, lat.astype(jnp.float32), coeffs)
            return prev, x0

        inter_x0 = []
        lat = latent.astype(jnp.float32)
        for i, t in enumerate(st.timesteps):
            bgs = {s: tbl[i] for s, tbl in (bg_tables or {}).items()}
            lat, x0 = step(lat, jnp.float32(t), jnp.asarray(coeff_table[i]), bgs)
            if i % self.log_freq == 0:
                inter_x0.append(np.asarray(x0))
        return self.decode_latents(lat), {"inter_x0": inter_x0}

    # ------------------------------------------------------------------
    # the main loop (/root/reference/elastic_diffusion.py:952-1130)
    # ------------------------------------------------------------------

    def _build_step_fn(self, statics: _StepStatics, text_cfg, uncond_text,
                       add_text_cfg, uncond_pooled, add_time_ids,
                       repaint: bool, scripted: bool,
                       controlnet_cond=None, controlnet_scale: float = 1.0):
        b = self.bundle
        vbs = self.view_batch_size if self.runtime.view_batch_size == 0 \
            else self.runtime.view_batch_size
        # one batched call by default; vbs only chunks when explicitly < V
        chunk = vbs if vbs and vbs < statics.view_plan.num_views else 0

        def step(lat, key, inp):
            t = inp["t"]
            coeffs = inp["coeffs"]
            bg_down = inp.get("bg_down", {})
            bg_view = inp.get("bg_view", {})
            k_dir, k_rep_noise, k_rep_dir, key = jax.random.split(key, 4)

            res = signals.approximate_latent_direction(
                b, lat, k_dir, t, text_cfg, statics.resample_plan,
                statics.down_pad, bg_down, statics.resampling_steps,
                statics.drop_p, add_text_embeds_cfg=add_text_cfg,
                add_time_ids=add_time_ids,
                scripted_picks=inp.get("picks_main") if scripted else None,
                controlnet_cond=controlnet_cond,
                controlnet_scale=controlnet_scale, mesh=self.mesh)
            local = signals.compute_local_uncond_signal(
                b, lat, t, uncond_text, statics.view_plan, statics.view_pad,
                bg_view, uncond_pooled=uncond_pooled,
                add_time_ids=add_time_ids, view_batch_size=chunk,
                mesh=self.mesh, controlnet_cond=controlnet_cond,
                controlnet_scale=controlnet_scale)
            pred = local + statics.guidance_scale * res.direction
            prev, x0 = DDIMScheduler.step_from_coeffs(
                pred, lat.astype(jnp.float32), coeffs)
            rrg_cfg = statics.guidance_scale
            used = res

            if repaint:
                lat2 = signals.undo_step(
                    prev, k_rep_noise, inp["undo_s1mb"], inp["undo_sb"],
                    scripted=inp.get("repaint_noise") if scripted else None)
                res2 = signals.approximate_latent_direction(
                    b, lat2, k_rep_dir, t, text_cfg, statics.resample_plan,
                    statics.down_pad, bg_down, 0, statics.drop_p,
                    add_text_embeds_cfg=add_text_cfg,
                    add_time_ids=add_time_ids,
                    scripted_picks=inp.get("picks_repaint") if scripted else None,
                    controlnet_cond=controlnet_cond,
                    controlnet_scale=controlnet_scale, mesh=self.mesh)
                local2 = signals.compute_local_uncond_signal(
                    b, lat2, t, uncond_text, statics.view_plan,
                    statics.view_pad, bg_view, uncond_pooled=uncond_pooled,
                    add_time_ids=add_time_ids, view_batch_size=chunk,
                    mesh=self.mesh, controlnet_cond=controlnet_cond,
                    controlnet_scale=controlnet_scale)
                rrg_cfg = statics.guidance_scale / 3
                pred2 = local2 + rrg_cfg * res2.direction
                prev, x0 = DDIMScheduler.step_from_coeffs(
                    pred2, lat2.astype(jnp.float32), coeffs)
                used = res2

            cascade, ref_x0 = signals.reduced_resolution_guidance(
                x0, used.downsampled_latent, used.uncond_score,
                used.downsampled_direction, rrg_cfg, inp["rrg_w"], coeffs)
            nxt = prev + jnp.where(inp["rrg_w"] > 10.0, cascade,
                                   jnp.zeros_like(cascade))
            aux = {"x0": x0, "rrg_x0": ref_x0,
                   "init_downsampled_latent": res.init_downsampled_latent}
            return nxt, key, aux

        return step

    @timelog.time_function
    def generate_image(self, prompts, negative_prompts: str = "",
                       height: int = 768, width: int = 768,
                       num_inference_steps: int = 50,
                       guidance_scale: float = 10.0,
                       resampling_steps: int = 20,
                       new_p: float = 0.3, rrg_stop_t: float = 0.2,
                       rrg_init_weight: float = 1000,
                       rrg_scherduler_cls=CosineScheduler,
                       cosine_scale: float = 3.0,
                       repaint_sampling: bool = True,
                       progress=None,
                       tiled_decoder: bool = False,
                       grid: bool = False,
                       latents=None,
                       scripted_noise: Optional[Dict[str, Any]] = None,
                       condition_image=None,
                       controlnet_conditioning_scale: float = 1.0,
                       return_arrays: bool = False,
                       checkpoint_path: Optional[str] = None,
                       checkpoint_every: int = 0,
                       resume_from: Optional[str] = None):
        """Reference signature preserved, incl. the `rrg_scherduler_cls`
        spelling (/root/reference/elastic_diffusion.py:952-965; SURVEY
        Appendix B.5). Extras: latents/scripted_noise (parity injection),
        condition_image (ControlNet), return_arrays."""
        import time as _time
        t_fn0 = _time.time()
        # preamble phase laps (host wall-clock; device dispatch is async on
        # the tunnel backend, so per-phase numbers attribute TRACE/COMPILE
        # cost — the dominant term — while queued device work lands in the
        # final 'flush' lap)
        _pre: Dict[str, float] = {}
        _pre_t = [t_fn0]
        # ED_PREAMBLE_SYNC=1: drain the device queue at every lap boundary
        # so each lap owns its DEVICE time too (dispatch is async on the
        # tunnel backend; a fresh 1-element fetch serializes behind the
        # queue). Costs a sync per lap — diagnosis only.
        _pre_sync = os.environ.get("ED_PREAMBLE_SYNC") == "1"

        def _lap(name):
            if _pre_sync:
                jax.device_get(jnp.zeros((), jnp.float32) + 0)
            now = _time.time()
            _pre[name] = _pre.get(name, 0.0) + (now - _pre_t[0])
            _pre_t[0] = now

        b = self.bundle
        if isinstance(prompts, str):
            prompts = [prompts]
        if isinstance(negative_prompts, str):
            negative_prompts = [negative_prompts] * len(prompts)
        B = len(prompts)
        vsf = self.vae_scale_factor
        if height % vsf or width % vsf:
            raise ValueError(f"height {height} and width {width} must be "
                             f"divisible by {vsf}")
        lat_h, lat_w = height // vsf, width // vsf
        down_h, down_w = self.get_downsample_size(height, width)

        # static plans
        resample_plan = build_resample_plan(lat_h, lat_w, down_h, down_w)
        # effective downsample can differ from requested at awkward ratios
        down_h, down_w = resample_plan.out_h, resample_plan.out_w
        view_plan = build_view_plan(lat_h, lat_w, self.view_config)
        m = b.config.min_latent_size
        down_pad = PadSpec(down_h, down_w, m, m)
        oh, ow = view_plan.out_shape
        view_pad = PadSpec(oh, ow, m, m)
        statics = _StepStatics(
            height=height, width=width, lat_h=lat_h, lat_w=lat_w,
            down_h=down_h, down_w=down_w, resample_plan=resample_plan,
            view_plan=view_plan, down_pad=down_pad, view_pad=view_pad,
            guidance_scale=guidance_scale, resampling_steps=resampling_steps,
            drop_p=1 - new_p, is_xl=b.config.is_xl)

        # schedules
        st = self.scheduler.set_timesteps(num_inference_steps)
        coeff_table = self.scheduler.coeff_tables(st)
        rrg_sched = make_rrg_scheduler(rrg_scherduler_cls, num_inference_steps,
                                       rrg_stop_t, rrg_init_weight, cosine_scale)
        rrg_w = rrg_weight_table(rrg_sched, num_inference_steps)

        # text
        _lap("setup")
        uncond_text, uncond_pooled = self.get_text_embeds(negative_prompts)
        cond_text, cond_pooled = self.get_text_embeds(prompts)
        _lap("text_encode")
        text_cfg = jnp.concatenate([uncond_text, cond_text])
        add_text_cfg = None
        add_time_ids = None
        uncond_pooled_arg = None
        if b.config.is_xl:
            add_text_cfg = jnp.concatenate([uncond_pooled, cond_pooled])
            # default_size=(4H, 4W) micro-conditioning quirk
            # (/root/reference/elastic_diffusion.py:969, 414; SURVEY App. B.8)
            default_size = (4 * height, 4 * width)
            add_time_ids = self._get_add_time_ids(default_size, (0, 0),
                                                  default_size)
            uncond_pooled_arg = uncond_pooled

        # conditioning is done: the denoise loop never reads the text
        # encoders, so under the auto/on offload policy their ~1.5 GB of
        # HBM goes back to the UNet chain's activation budget (decisive
        # with ControlNet resident on a 16 GB chip; RuntimeConfig.text_offload)
        off = getattr(self.runtime, "text_offload", "off")
        if off == "on" or (off == "auto" and b.controlnet_params is not None
                           and jax.default_backend() not in ("cpu",)):
            b.offload_text_encoders()
        _lap("text_offload")

        # ControlNet condition: the reference prepares it at
        # downsample_size*8 (w_controlnet.py:1183-1193) and the pipeline
        # derives both the direction-path (zero-padded low-res) and the
        # local-path (nearest-upsampled + view-cropped) tensors from it.
        # A full-res input is accepted and nearest-downsampled (documented
        # convenience deviation).
        cn_cond = None
        if condition_image is not None:
            from elasticdiffusion_tpu.ops.resize import nearest_resize
            cn_cond = jnp.asarray(condition_image, jnp.float32)
            if cn_cond.ndim == 3:
                cn_cond = cn_cond[None]
            low = (down_h * vsf, down_w * vsf)
            assert cn_cond.shape[1] == 3 and cn_cond.shape[0] in (1, B), (
                f"condition must be (1|{B},3,h,w) in [0,1], got {cn_cond.shape}")
            if tuple(cn_cond.shape[2:]) != low:
                cn_cond = nearest_resize(cn_cond, low)
            if cn_cond.shape[0] == 1 and B > 1:
                cn_cond = jnp.broadcast_to(cn_cond, (B,) + cn_cond.shape[1:])
            _lap("condition_prep")

        # initial latent (/root/reference/elastic_diffusion.py:998-1000)
        key = jax.random.fold_in(self._base_key, 1)
        k_init, key = jax.random.split(key)
        if latents is None:
            lat = jax.random.normal(
                k_init, (B, b.in_channels, lat_h, lat_w), jnp.float32)
        else:
            lat = jnp.asarray(latents, jnp.float32)

        # background tables
        bg_key = jax.random.fold_in(self._base_key, 2)
        bg_down_tbl = make_background_table(b, st.timesteps, down_pad,
                                            bg_key, self.scheduler) \
            if down_pad.needs_padding else {}
        bg_view_tbl = make_background_table(b, st.timesteps, view_pad,
                                            jax.random.fold_in(bg_key, 1),
                                            self.scheduler) \
            if view_pad.needs_padding else {}
        _lap("background_tables")

        scripted = scripted_noise is not None
        do_repaint = repaint_sampling and resampling_steps > 0
        from elasticdiffusion_tpu.core.segmented import (
            build_segmented_step, should_segment,
        )
        use_segmented = should_segment(self.runtime, b.config)
        warm_pending = None
        if use_segmented:
            # builders are cached per shape/config: their glue programs are
            # expensive to (re)compile on the remote service, and everything
            # prompt/condition-dependent is re-aimed via update_conditioning
            # B is part of the key: update_conditioning re-aims a cached
            # builder only at SAME-batch tensors (glue programs are
            # shape-specialized; ADVICE r2)
            # effective view_batch_size is baked into the builder's chunking
            # (segmented.py), so a live mutation (app_gradio.py:36 pattern)
            # must miss the cache rather than silently keep the old chunking
            vbs_eff = self.runtime.view_batch_size or self.view_batch_size
            ck = ("seg", height, width, guidance_scale, resampling_steps,
                  new_p, self.view_config, scripted, do_repaint,
                  cn_cond is None, B, vbs_eff)
            cached = self._step_cache.get(ck)
            fresh_step = cached is None
            if cached is None:
                mk = lambda rp: build_segmented_step(
                    self, statics, text_cfg, uncond_text, add_text_cfg,
                    uncond_pooled_arg, add_time_ids, repaint=rp,
                    scripted=scripted, controlnet_cond=cn_cond,
                    controlnet_scale=controlnet_conditioning_scale)
                cached = (mk(True) if do_repaint else None, mk(False))
                self._step_cache[ck] = cached
            step_repaint, step_plain = cached
            step_repaint_raw, step_plain_raw = step_repaint, step_plain
            for s in (step_repaint, step_plain):
                if s is not None:
                    s.update_conditioning(
                        text_cfg, uncond_text, add_text_cfg=add_text_cfg,
                        uncond_pooled=uncond_pooled_arg,
                        add_time_ids=add_time_ids, controlnet_cond=cn_cond,
                        controlnet_scale=controlnet_conditioning_scale)
                    s.collect_phase_times = getattr(
                        self, "collect_phase_times", False)
                    s.phase_times.clear()
            ws = getattr(self.runtime, "warm_start", "auto")
            warm_pending = None
            if fresh_step and (ws == "on" or (
                    ws == "auto" and jax.default_backend() not in ("cpu",))):
                # concurrent chain+glue compile ahead of the first step call
                # (sum-of-compiles -> max; see segmented.step.warm_start);
                # deferred until the per-step tables exist so the glue warm
                # gets production-shaped operands
                warm_pending = step_repaint or step_plain
        else:
            mk = lambda rp: self._build_step_fn(
                statics, text_cfg, uncond_text, add_text_cfg,
                uncond_pooled_arg, add_time_ids, repaint=rp,
                scripted=scripted, controlnet_cond=cn_cond,
                controlnet_scale=controlnet_conditioning_scale)
            step_repaint_raw = mk(True) if do_repaint else None
            step_plain_raw = mk(False)
            step_repaint = jax.jit(step_repaint_raw) if do_repaint else None
            step_plain = jax.jit(step_plain_raw)
        _lap("step_build")

        # per-step cost model (SURVEY §3.1)
        V = view_plan.num_views
        fwd_per_step = 2 * (resampling_steps + 1) + V
        fwd_repaint = 2 + V

        # latent checkpoint/resume (SURVEY §5: long generations on TPU should
        # checkpoint (latent, step, key) — cheap: one latent array + RNG key)
        start_step = 0
        if resume_from is not None:
            ck = np.load(resume_from)
            assert tuple(ck["latent"].shape) == tuple(lat.shape), (
                f"checkpoint latent {ck['latent'].shape} != {lat.shape}")
            lat = jnp.asarray(ck["latent"])
            key = jnp.asarray(ck["key"])
            start_step = int(ck["step"]) + 1

        # fully fused lax.scan loop (RuntimeConfig.fused_loop): one compiled
        # program for the whole denoise schedule; per-step constants are
        # stacked tables scanned over. Host loop remains the default for
        # progress/logging/checkpointing.
        use_fused = (self.runtime.fused_loop and not use_segmented
                     and not self.verbose
                     and scripted_noise is None and start_step == 0
                     and not checkpoint_every and do_repaint
                     and num_inference_steps >= 2)
        if use_fused:
            T = num_inference_steps
            undo = [self.scheduler.undo_step_coeffs(st, int(st.timesteps[i + 1]))
                    for i in range(T - 1)]
            xs = {"t": jnp.asarray(st.timesteps[:T - 1], jnp.float32),
                  "coeffs": jnp.asarray(coeff_table[:T - 1]),
                  "rrg_w": jnp.asarray(rrg_w[:T - 1], jnp.float32),
                  "bg_down": {s: tbl[:T - 1] for s, tbl in bg_down_tbl.items()},
                  "bg_view": {s: tbl[:T - 1] for s, tbl in bg_view_tbl.items()},
                  "undo_s1mb": jnp.stack([jnp.asarray(u[0]) for u in undo]),
                  "undo_sb": jnp.stack([jnp.asarray(u[1]) for u in undo])}

            @jax.jit
            def fused(lat, key, xs, last_inp):
                def body(carry, x):
                    l, k = carry
                    l, k, aux = step_repaint_raw(l, k, x)
                    return (l, k), aux["init_downsampled_latent"]
                (lat, key), init_down = jax.lax.scan(body, (lat, key), xs)
                lat, key, _ = step_plain_raw(lat, key, last_inp)
                return lat, key, init_down[0]

            last_inp = {"t": jnp.float32(float(st.timesteps[-1])),
                        "coeffs": jnp.asarray(coeff_table[-1]),
                        "rrg_w": jnp.float32(rrg_w[-1]),
                        "bg_down": {s: tbl[-1] for s, tbl in bg_down_tbl.items()},
                        "bg_view": {s: tbl[-1] for s, tbl in bg_view_tbl.items()}}
            import time as _time
            t_start = _time.time()
            lat, key, init_downsampled_latent = fused(lat, key, xs, last_inp)
            lat.block_until_ready()
            elapsed = _time.time() - t_start
            V = view_plan.num_views
            total_fwd = (num_inference_steps * (2 * (resampling_steps + 1) + V)
                         + (num_inference_steps - 1) * (2 + V))
            self.last_metrics = {
                "steps": num_inference_steps, "views": V,
                "unet_view_forwards": total_fwd,
                "denoise_seconds": elapsed,
                "unet_view_forwards_per_sec": total_fwd / max(elapsed, 1e-9),
                "fused": True,
            }

        init_downsampled_latent = None if not use_fused else init_downsampled_latent
        inter_x0 = []
        inter_rrg_x0 = []
        steps_iter = range(start_step, num_inference_steps) if not use_fused \
            else range(0)
        if progress is not None:
            steps_iter = progress(steps_iter)
        total_fwd = 0
        # per-step constants as DEVICE tables sliced in the loop: host->device
        # uploads inside the loop are tunnel roundtrips that flush the async
        # dispatch pipeline (measured 2-3x per-step inflation vs the bench's
        # device-resident inputs); table slices stay async
        T = num_inference_steps
        t_tbl = jnp.asarray(np.asarray(st.timesteps, np.float32))
        coeffs_tbl = jnp.asarray(np.asarray(coeff_table))
        rrg_tbl = jnp.asarray(np.asarray(rrg_w, np.float32))
        undo_s1mb_tbl = undo_sb_tbl = None
        # T == 1: the only step is the last step, which never repaints
        # (/root/reference/elastic_diffusion.py:1038: `i < len(...) - 1`)
        if do_repaint and not use_fused and T > 1:
            undo = [self.scheduler.undo_step_coeffs(st, int(st.timesteps[i + 1]))
                    for i in range(T - 1)]
            undo_s1mb_tbl = jnp.asarray(np.stack([np.asarray(u[0]) for u in undo]))
            undo_sb_tbl = jnp.asarray(np.stack([np.asarray(u[1]) for u in undo]))
        if warm_pending is not None and not use_fused:
            # concurrent chain+glue compile ahead of the first step call,
            # with the first step's REAL table slices as glue shape donors
            winp = {"t": t_tbl[0], "coeffs": coeffs_tbl[0],
                    "rrg_w": rrg_tbl[0],
                    "bg_down": {s: tbl[0] for s, tbl in bg_down_tbl.items()},
                    "bg_view": {s: tbl[0] for s, tbl in bg_view_tbl.items()}}
            if undo_s1mb_tbl is not None:
                winp["undo_s1mb"] = undo_s1mb_tbl[0]
                winp["undo_sb"] = undo_sb_tbl[0]
            _lap("schedule_tables")
            warm_pending.warm_start(winp)
            _lap("warm_start")
        # flush the queued preamble (text encode, background VAE encodes,
        # init latent) before starting the denoise timer: dispatch is async
        # on the tunnel backend and the first step's timing would otherwise
        # absorb all of it (1-element fetches; block_until_ready does not
        # wait for execution on this backend)
        if not use_fused:
            for _a in (lat, *(t for d in (bg_down_tbl, bg_view_tbl)
                              for t in d.values())):
                jax.device_get(jnp.ravel(_a)[0])
            _lap("flush")
        t_start = _time.time()
        for i in steps_iter:
            inp = {"t": t_tbl[i], "coeffs": coeffs_tbl[i],
                   "rrg_w": rrg_tbl[i],
                   "bg_down": {s: tbl[i] for s, tbl in bg_down_tbl.items()},
                   "bg_view": {s: tbl[i] for s, tbl in bg_view_tbl.items()}}
            use_repaint = do_repaint and i < num_inference_steps - 1
            if use_repaint:
                inp["undo_s1mb"] = undo_s1mb_tbl[i]
                inp["undo_sb"] = undo_sb_tbl[i]
            if scripted:
                for k_, v_ in scripted_noise.items():
                    arr = v_[i] if isinstance(v_, (list, tuple)) else v_
                    inp[k_] = jnp.asarray(arr)
            fn = step_repaint if use_repaint else step_plain
            lat, key, aux = fn(lat, key, inp)
            total_fwd += fwd_per_step + (fwd_repaint if use_repaint else 0)
            if init_downsampled_latent is None:
                init_downsampled_latent = aux["init_downsampled_latent"]
            if self.verbose and i % self.log_freq == 0:
                inter_x0.append(np.asarray(aux["x0"]))
                if rrg_w[i] > 10:
                    inter_rrg_x0.append(np.asarray(aux["rrg_x0"]))
            if checkpoint_path and checkpoint_every \
                    and (i + 1) % checkpoint_every == 0:
                np.savez(checkpoint_path, latent=np.asarray(lat),
                         key=np.asarray(key), step=i)
        if not use_fused:
            lat.block_until_ready()
            elapsed = _time.time() - t_start
            self.last_metrics = {
                "steps": num_inference_steps, "views": V,
                "unet_view_forwards": total_fwd,
                "denoise_seconds": elapsed,
                "unet_view_forwards_per_sec": total_fwd / max(elapsed, 1e-9),
                "preamble_seconds": t_start - t_fn0,
                "preamble_breakdown": dict(_pre),
                "segmented": use_segmented,
            }
            if use_segmented and getattr(self, "collect_phase_times", False):
                phases = dict(step_plain.phase_times)
                if step_repaint is not None:
                    for k_, v_ in step_repaint.phase_times.items():
                        phases[k_] = phases.get(k_, 0.0) + v_
                self.last_metrics["phase_seconds"] = phases

        # decode + logs (/root/reference/elastic_diffusion.py:1080-1130)
        if tiled_decoder:
            decode_fn = self.halo_decode if getattr(self, "use_halo_decode", True) \
                else self.tiled_decode
        else:
            decode_fn = self.decode_latents
        image_log: Dict[str, Any] = {}
        if self.verbose:
            if init_downsampled_latent is not None:
                g_img, g_info = self.generate(
                    init_downsampled_latent, text_cfg, add_text_cfg,
                    guidance_scale=guidance_scale,
                    num_inference_steps=num_inference_steps,
                    add_time_ids=add_time_ids, pad_spec=down_pad,
                    bg_tables=bg_down_tbl or None, state=st)
                image_log["global_img"] = to_pil(np.asarray(g_img))[0]
                if g_info["inter_x0"]:
                    dec = np.concatenate([np.asarray(self.decode_latents(
                        jnp.asarray(x))) for x in g_info["inter_x0"]])
                    image_log["global_img_inter_x0_imgs"] = to_pil(
                        make_grid(dec, nrow=len(dec))[None])[0]
            if inter_x0:
                dec = np.concatenate([np.asarray(decode_fn(jnp.asarray(x)))
                                      for x in inter_x0])
                image_log["intermediate_x0_imgs"] = to_pil(
                    make_grid(np.clip(dec, 0, 1), nrow=len(dec))[None])[0]
            if inter_rrg_x0:
                dec = np.concatenate([np.asarray(decode_fn(jnp.asarray(x)))
                                      for x in inter_rrg_x0])
                image_log["intermediate_cascade_x0_imgs"] = {
                    "rrg": to_pil(make_grid(dec, nrow=len(dec))[None])[0]}

        t_dec0 = _time.time()
        decode_bs = 1
        imgs = jnp.concatenate([decode_fn(lat[i:i + decode_bs])
                                for i in range(0, B, decode_bs)])
        jax.device_get(jnp.ravel(imgs)[0])  # tunnel-safe sync
        if isinstance(self.last_metrics, dict):
            self.last_metrics["decode_seconds"] = _time.time() - t_dec0
        if return_arrays:
            return np.asarray(imgs), {"latent": np.asarray(lat), **image_log}
        if grid:
            arr = make_grid(np.asarray(imgs), nrow=B)[None]
            return to_pil(arr), image_log
        # PIL return path: clip/scale/uint8/NHWC on device, fetch 12 MB of
        # uint8 instead of 50 MB of float32 (the remote tunnel and the slow
        # host core both scale with bytes moved)
        return to_pil_device(imgs), image_log
