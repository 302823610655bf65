"""text2img CLI, mirroring /root/reference/elastic_diffusion.py:1134-1210.

Flag surface preserved (SURVEY Appendix A), with the reference's
`type=bool` argparse footguns replaced by proper boolean flags
(SURVEY Appendix B.9). Extras: --checkpoint_dir / --tokenizer_dir (offline
weight loading), --mesh (e.g. '1x8' for a data x views mesh), --fp32.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def str2bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes", "y", "t")


def build_parser(controlnet: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str,
                   default="A realistic portrait of a young black woman. she "
                           "has a Christmas red hat and a red scarf. Her eyes "
                           "are light brown like they're almost caramel color. "
                           "Her attire, simple yet dignified.")
    p.add_argument("--negative", type=str,
                   default="blurry, ugly, duplicate, no details, deformed")
    p.add_argument("--sd_version", type=str, default="XL1.0",
                   help="['1.4','1.5','2.0','2.1','XL1.0'] or an HF model key")
    p.add_argument("--H", type=int, default=2048)
    p.add_argument("--W", type=int, default=2048)
    p.add_argument("--low_vram", type=str2bool, default=False,
                   help="bf16 weights + activation remat (TPU analog)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--num_sampled", type=int, default=1)
    p.add_argument("--guidance_scale", type=float, default=10.0)
    p.add_argument("--cosine_scale", type=float, default=10.0,
                   help="effective only with CosineScheduler")
    p.add_argument("--rrg_scale", type=float, default=4000)
    p.add_argument("--resampling_steps", type=int, default=10)
    p.add_argument("--new_p", type=float, default=0.3)
    p.add_argument("--rrg_stop_t", type=float, default=0.2)
    p.add_argument("--view_batch_size", type=int, default=16)
    p.add_argument("--outdir", type=str, default="results_log/")
    p.add_argument("--make_grid", type=str2bool, default=False)
    p.add_argument("--repaint_sampling", type=str2bool, default=True)
    p.add_argument("--tiled_decoder", type=str2bool, default=False)
    p.add_argument("--exp", type=str, default="ElasticDiffusion")
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--log_freq", type=int, default=5)
    p.add_argument("--verbose", type=str2bool, default=False)
    # TPU-native extras
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="directory of converted .npz params (models/convert.py)")
    p.add_argument("--tokenizer_dir", type=str, default=None, nargs="*",
                   help="dir(s) with vocab.json+merges.txt")
    p.add_argument("--mesh", type=str, default=None,
                   help="mesh shape 'DATAxVIEWS', e.g. 1x8")
    p.add_argument("--fp32", type=str2bool, default=False)
    if controlnet:
        p.add_argument("--controlnet_conditioning_scale", type=float, default=0.2)
        p.add_argument("--condition_image", type=str,
                       default="imgs/input/yoga.jpeg")
        p.add_argument("--controlnet_model", type=str, default="depth",
                       choices=["canny", "depth"])
    return p


def make_pipe(opt, controlnet_model=None):
    import jax.numpy as jnp
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion

    mesh_shape = (1, 1)
    if opt.mesh:
        d, v = opt.mesh.lower().split("x")
        mesh_shape = (int(d), int(v))
    dtype = jnp.float32 if opt.fp32 else jnp.bfloat16
    runtime = RuntimeConfig(param_dtype=dtype, compute_dtype=dtype,
                            remat_unet=opt.low_vram, mesh_shape=mesh_shape,
                            view_batch_size=0)
    tok = tuple(opt.tokenizer_dir) if opt.tokenizer_dir else None
    pipe = ElasticDiffusion(sd_version=opt.sd_version, verbose=opt.verbose,
                            log_freq=opt.log_freq,
                            view_batch_size=opt.view_batch_size,
                            low_vram=opt.low_vram,
                            checkpoint_dir=opt.checkpoint_dir,
                            controlnet_model=controlnet_model,
                            tokenizer_dirs=tok, runtime=runtime)
    return pipe


def save_outputs(opt, imgs, image_log):
    current_time = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    save_dir = os.path.join(opt.outdir, opt.exp, f"{current_time}_{opt.seed}")
    os.makedirs(save_dir, exist_ok=True)
    for i, img in enumerate(imgs):
        img.save(f"{save_dir}/{i}.png")
    for key, val in image_log.items():
        if isinstance(val, dict):
            for label, img in val.items():
                img.save(f"{save_dir}/{key}_{label}.png")
        elif hasattr(val, "save"):
            val.save(f"{save_dir}/{key}.png")
    with open(f"{save_dir}/args.txt", "w") as f:
        f.write("\n".join(f"{k}: {v}" for k, v in vars(opt).items()))
    return save_dir


def main(argv=None):
    opt = build_parser().parse_args(argv)
    from tqdm import tqdm
    from elasticdiffusion_tpu.utils.timeit import timelog
    timelog.sync = opt.verbose

    pipe = make_pipe(opt)
    pipe.seed_everything(opt.seed)
    prompts = [opt.prompt] * opt.num_sampled
    imgs, image_log = pipe.generate_image(
        prompts=prompts, negative_prompts=opt.negative,
        height=opt.H, width=opt.W, num_inference_steps=opt.steps,
        grid=opt.make_grid, guidance_scale=opt.guidance_scale,
        resampling_steps=opt.resampling_steps, new_p=opt.new_p,
        cosine_scale=opt.cosine_scale, rrg_init_weight=opt.rrg_scale,
        rrg_stop_t=opt.rrg_stop_t, repaint_sampling=opt.repaint_sampling,
        tiled_decoder=opt.tiled_decoder, progress=tqdm)
    if opt.verbose:
        timelog.print_results()
    print(f"[metrics] {pipe.last_metrics}")
    save_dir = save_outputs(opt, imgs, image_log)
    print(f"[INFO] saved to {save_dir}")


if __name__ == "__main__":
    main()
