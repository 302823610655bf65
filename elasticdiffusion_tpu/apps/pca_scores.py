"""PCA score visualizer (SURVEY C25), mirroring
/root/reference/pca_diffusion_scores.py: a vanilla SD sampling loop that, per
step, PCA-projects the CFG direction and unconditional score to RGB and saves
them alongside intermediate x0 decodes, plus device-memory stats.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np


def pca_to_rgb(score_nchw: np.ndarray) -> np.ndarray:
    """(B, C, H, W) score -> (B, 3, H, W) in [0,1] via 3-component PCA over
    the channel axis (pca_diffusion_scores.py:165-196)."""
    from sklearn.decomposition import PCA
    B, C, H, W = score_nchw.shape
    out = np.zeros((B, 3, H, W), np.float32)
    for b in range(B):
        flat = score_nchw[b].reshape(C, H * W).T  # (HW, C)
        comp = PCA(n_components=3).fit_transform(flat)  # (HW, 3)
        comp = (comp - comp.min(0)) / np.maximum(comp.max(0) - comp.min(0), 1e-8)
        out[b] = comp.T.reshape(3, H, W)
    return out


def memory_stats() -> dict:
    """Device memory report (TPU analog of the reference's CUDA stats,
    pca_diffusion_scores.py:257-266)."""
    import jax
    stats = {}
    try:
        for d in jax.local_devices():
            s = d.memory_stats() or {}
            stats[str(d)] = {
                "bytes_in_use_mb": round(s.get("bytes_in_use", 0) / 2**20, 1),
                "peak_bytes_mb": round(s.get("peak_bytes_in_use", 0) / 2**20, 1),
                "bytes_limit_mb": round(s.get("bytes_limit", 0) / 2**20, 1),
            }
    except Exception:
        pass
    return stats


class VanillaLDM:
    """Plain SD sampler with per-step score capture
    (pca_diffusion_scores.py:23-217)."""

    def __init__(self, device=None, sd_version="2.0", checkpoint_dir=None,
                 bundle=None, log_freq=5):
        from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
        self.pipe = ElasticDiffusion(sd_version=sd_version,
                                     checkpoint_dir=checkpoint_dir,
                                     bundle=bundle, log_freq=log_freq)
        self.log_freq = log_freq

    def generate_image(self, prompts, negative_prompts="", height=512,
                       width=512, num_inference_steps=50, guidance_scale=7.5,
                       seed=0):
        import jax
        import jax.numpy as jnp
        from elasticdiffusion_tpu.core.background import PadSpec
        from elasticdiffusion_tpu.core import signals
        from elasticdiffusion_tpu.sched.ddim import DDIMScheduler

        p = self.pipe
        b = p.bundle
        p.seed_everything(seed)
        if isinstance(prompts, str):
            prompts = [prompts]
        if isinstance(negative_prompts, str):
            negative_prompts = [negative_prompts] * len(prompts)
        uncond, up = p.get_text_embeds(negative_prompts)
        cond, cp = p.get_text_embeds(prompts)
        text_cfg = jnp.concatenate([uncond, cond])
        add_cfg = jnp.concatenate([up, cp]) if b.config.is_xl else None
        tids = p._get_add_time_ids((height, width), (0, 0), (height, width)) \
            if b.config.is_xl else None

        st = p.scheduler.set_timesteps(num_inference_steps)
        coeffs = p.scheduler.coeff_tables(st)
        vsf = p.vae_scale_factor
        lat = jax.random.normal(
            jax.random.fold_in(p._base_key, 1),
            (len(prompts), b.in_channels, height // vsf, width // vsf),
            jnp.float32)
        pad = PadSpec(lat.shape[-2], lat.shape[-1],
                      b.config.min_latent_size, b.config.min_latent_size)

        @jax.jit
        def step(lat, t, cf):
            direction, eps_u, _ = signals.obtain_latent_direction(
                b, lat, t, text_cfg, pad, {}, add_text_embeds_cfg=add_cfg,
                add_time_ids=tids)
            pred = eps_u + guidance_scale * direction
            prev, x0 = DDIMScheduler.step_from_coeffs(
                pred, lat.astype(jnp.float32), cf)
            return prev, x0, direction, eps_u

        logs = {"direction_pca": [], "uncond_pca": [], "inter_x0": []}
        for i in range(num_inference_steps):
            lat, x0, direction, eps_u = step(
                lat, jnp.float32(float(st.timesteps[i])),
                jnp.asarray(coeffs[i]))
            if i % self.log_freq == 0:
                logs["direction_pca"].append(pca_to_rgb(np.asarray(direction)))
                logs["uncond_pca"].append(pca_to_rgb(np.asarray(eps_u)))
                logs["inter_x0"].append(np.asarray(
                    p.decode_latents(jnp.asarray(x0))))
        img = np.asarray(p.decode_latents(lat))
        return img, logs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", type=str, default="a photo of the santorini")
    ap.add_argument("--negative", type=str, default="")
    ap.add_argument("--sd_version", type=str, default="2.0")
    ap.add_argument("--H", type=int, default=512)
    ap.add_argument("--W", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance_scale", type=float, default=7.5)
    ap.add_argument("--log_freq", type=int, default=5)
    ap.add_argument("--outdir", type=str, default="results_log/pca/")
    ap.add_argument("--checkpoint_dir", type=str, default=None)
    opt = ap.parse_args(argv)

    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.utils.image import to_pil

    ldm = VanillaLDM(sd_version=opt.sd_version,
                     checkpoint_dir=opt.checkpoint_dir, log_freq=opt.log_freq)
    img, logs = ldm.generate_image(opt.prompt, opt.negative, opt.H, opt.W,
                                   opt.steps, opt.guidance_scale, opt.seed)

    stamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    out = os.path.join(opt.outdir, f"{stamp}_{opt.seed}")
    os.makedirs(out, exist_ok=True)
    to_pil(img)[0].save(f"{out}/final.png")
    for k in ("direction_pca", "uncond_pca", "inter_x0"):
        for i, arr in enumerate(logs[k]):
            to_pil(np.clip(arr, 0, 1))[0].save(f"{out}/{k}_{i}.png")
    print(f"[INFO] saved to {out}")
    for dev, s in memory_stats().items():
        print(f"[mem] {dev}: {s}")


if __name__ == "__main__":
    main()
