"""ControlNet img2img CLI, mirroring
/root/reference/elastic_diffusion_w_controlnet.py:1342-1433."""

from __future__ import annotations

import numpy as np

from elasticdiffusion_tpu.apps.cli import build_parser, make_pipe, save_outputs
from elasticdiffusion_tpu.apps.preprocessors import (
    prepare_image, process_condition_image,
)


def main(argv=None):
    opt = build_parser(controlnet=True).parse_args(argv)
    from PIL import Image
    from tqdm import tqdm
    from elasticdiffusion_tpu.utils.timeit import timelog
    timelog.sync = opt.verbose

    pipe = make_pipe(opt, controlnet_model=opt.controlnet_model)
    pipe.seed_everything(opt.seed)

    # condition prepared AT the downsampled size * 8 and handed to the
    # pipeline at that size; the pipeline zero-pads it for the direction
    # path and nearest-upsamples + view-crops it for the local path
    # (w_controlnet.py:1390-1393, 1183-1193, 932-949)
    img = Image.open(opt.condition_image)
    dh, dw = pipe.get_downsample_size(opt.H, opt.W)
    vsf = pipe.vae_scale_factor
    img_small = img.resize((dw * vsf, dh * vsf)).convert("RGB")
    cond = process_condition_image(img_small, opt.controlnet_model)
    cond_low = prepare_image(cond, dw * vsf, dh * vsf, batch_size=1)

    prompts = [opt.prompt] * opt.num_sampled
    imgs, image_log = pipe.generate_image(
        prompts=prompts, negative_prompts=opt.negative,
        height=opt.H, width=opt.W, num_inference_steps=opt.steps,
        grid=opt.make_grid, guidance_scale=opt.guidance_scale,
        resampling_steps=opt.resampling_steps, new_p=opt.new_p,
        cosine_scale=opt.cosine_scale, rrg_init_weight=opt.rrg_scale,
        rrg_stop_t=opt.rrg_stop_t, repaint_sampling=opt.repaint_sampling,
        tiled_decoder=opt.tiled_decoder, progress=tqdm,
        condition_image=cond_low,
        controlnet_conditioning_scale=opt.controlnet_conditioning_scale)
    if opt.verbose:
        timelog.print_results()
    save_dir = save_outputs(opt, imgs, image_log)
    print(f"[INFO] saved to {save_dir}")


if __name__ == "__main__":
    main()
