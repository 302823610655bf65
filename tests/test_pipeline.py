"""End-to-end pipeline tests on the toy bundle (BASELINE config analogs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toy_configs import make_toy_bundle

from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion


@pytest.fixture(scope="module")
def pipe():
    return ElasticDiffusion(bundle=make_toy_bundle(), verbose=False)


def test_generate_image_native(pipe):
    """Native-size generation (BASELINE config 1 analog): rs=0, rrg=0."""
    pipe.seed_everything(0)
    imgs, log = pipe.generate_image(
        "a cat", height=16, width=16, num_inference_steps=2,
        guidance_scale=7.5, resampling_steps=0, rrg_init_weight=0,
        repaint_sampling=False)
    assert len(imgs) == 1
    assert imgs[0].size == (16, 16)
    m = pipe.last_metrics
    # cost model: rs=0, V=1 (collapsed) -> 2 + 1 = 3 forwards/step
    assert m["views"] == 1
    assert m["unet_view_forwards"] == 2 * 3


def test_single_step_with_repaint_enabled(pipe):
    """num_inference_steps=1 with repaint_sampling=True must not crash: the
    only step is the last step, which never repaints (the reference gates
    repaint on `i < len(timesteps) - 1`, elastic_diffusion.py:1038), so the
    undo-coefficient table is empty. Regression: np.stack([]) ValueError.
    Forced onto the host-loop segmented path — the fused lax.scan path
    builds no host-side undo table."""
    from elasticdiffusion_tpu.configs import RuntimeConfig
    p = ElasticDiffusion(bundle=make_toy_bundle(),
                         runtime=RuntimeConfig(param_dtype=jnp.float32,
                                               compute_dtype=jnp.float32,
                                               use_pallas="off",
                                               segmented_step="on"))
    p.seed_everything(0)
    imgs, _ = p.generate_image(
        "a cat", height=16, width=24, num_inference_steps=1,
        guidance_scale=7.5, resampling_steps=1, rrg_init_weight=0,
        repaint_sampling=True)
    assert imgs[0].size == (24, 16)
    assert p.last_metrics["unet_view_forwards"] == 2 * 2 + \
        p.last_metrics["views"]  # no repaint forwards on the last step


def test_generate_image_elastic(pipe):
    """2x-size with views + resampling + repaint + RRG (config 2 analog)."""
    pipe.seed_everything(0)
    arr, log = pipe.generate_image(
        "a cat", height=32, width=48, num_inference_steps=3,
        guidance_scale=7.5, resampling_steps=2, new_p=0.3,
        rrg_init_weight=1000, rrg_stop_t=0.0, repaint_sampling=True,
        return_arrays=True)
    imgs = arr
    assert imgs.shape == (1, 3, 32, 48)
    assert np.isfinite(imgs).all()
    m = pipe.last_metrics
    # latent 16x24, window 4, ctx 4 -> views over 16x24... window+ctx=8 < 16
    V = m["views"]
    assert m["unet_view_forwards"] == 3 * (2 * 3 + V) + 2 * (2 + V)


def test_generate_image_extreme_aspect_ratio(pipe):
    """4:1 aspect ratio, the reference example table's 2048x512 class
    (/root/reference/app_gradio.py:119-120) scaled to the toy bundle:
    W = 2x native, H = native/2. The short axis collapses to one view and
    sits BELOW the model minimum (background padding engages) while the
    long axis fans out — the geometry the extreme-AR examples stress."""
    pipe.seed_everything(0)
    for h, w in [(8, 32), (32, 8)]:
        arr, _ = pipe.generate_image(
            "a cat", height=h, width=w, num_inference_steps=2,
            guidance_scale=7.5, resampling_steps=2, new_p=0.3,
            rrg_init_weight=1000, rrg_stop_t=0.0, repaint_sampling=True,
            return_arrays=True)
        assert arr.shape == (1, 3, h, w)
        assert np.isfinite(arr).all()


def test_seed_determinism(pipe):
    pipe.seed_everything(123)
    a, _ = pipe.generate_image("a cat", height=16, width=16,
                               num_inference_steps=2, resampling_steps=1,
                               repaint_sampling=False, return_arrays=True)
    pipe.seed_everything(123)
    b, _ = pipe.generate_image("a cat", height=16, width=16,
                               num_inference_steps=2, resampling_steps=1,
                               repaint_sampling=False, return_arrays=True)
    np.testing.assert_array_equal(a, b)
    pipe.seed_everything(124)
    c, _ = pipe.generate_image("a cat", height=16, width=16,
                               num_inference_steps=2, resampling_steps=1,
                               repaint_sampling=False, return_arrays=True)
    assert np.abs(a - c).max() > 1e-6


def test_batch_and_grid(pipe):
    pipe.seed_everything(0)
    imgs, _ = pipe.generate_image(["a", "b"], height=16, width=16,
                                  num_inference_steps=2, resampling_steps=0,
                                  repaint_sampling=False)
    assert len(imgs) == 2
    imgs_grid, _ = pipe.generate_image(["a", "b"], height=16, width=16,
                                       num_inference_steps=2,
                                       resampling_steps=0,
                                       repaint_sampling=False, grid=True)
    assert len(imgs_grid) == 1


def test_tiled_decoder_matches_plain_interior(pipe):
    """Tiled decode must be finite and close to plain decode away from seams
    (the reference itself shows seams, README.md:114)."""
    pipe.seed_everything(0)
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 16, 16))
    plain = np.asarray(pipe.decode_latents(lat))
    tiled = np.asarray(pipe.tiled_decode(lat))
    assert tiled.shape == plain.shape
    assert np.isfinite(tiled).all()


def test_xl_pipeline():
    pipe = ElasticDiffusion(bundle=make_toy_bundle(xl=True))
    pipe.seed_everything(0)
    arr, _ = pipe.generate_image("a cat", height=32, width=32,
                                 num_inference_steps=2, resampling_steps=1,
                                 repaint_sampling=True, rrg_init_weight=500,
                                 rrg_stop_t=0.0, return_arrays=True)
    assert arr.shape == (1, 3, 32, 32)
    assert np.isfinite(arr).all()


def test_verbose_image_log(pipe):
    pipe.verbose = True
    pipe.seed_everything(0)
    try:
        imgs, log = pipe.generate_image(
            "a cat", height=32, width=32, num_inference_steps=2,
            resampling_steps=1, rrg_init_weight=1000, rrg_stop_t=0.0)
        assert "global_img" in log
        assert "intermediate_x0_imgs" in log
    finally:
        pipe.verbose = False


def test_scripted_picks_reproduce(pipe):
    """Scripted randomness must override sampling deterministically."""
    pipe.seed_everything(0)
    N = None
    from elasticdiffusion_tpu.ops.resample import build_resample_plan
    # latent 16x24 at 32x48px -> native 16 -> factor 3 -> down (5,8)
    h, w = pipe.get_downsample_size(32, 48)
    plan = build_resample_plan(16, 24, h, w)
    N = plan.num_blocks
    rs = 1
    picks = [np.zeros((rs + 1, N), np.int32) for _ in range(2)]
    lat0 = np.random.default_rng(0).standard_normal((1, 4, 16, 24)).astype(np.float32)
    a, _ = pipe.generate_image("a cat", height=32, width=48,
                               num_inference_steps=2, resampling_steps=rs,
                               repaint_sampling=False, latents=lat0,
                               scripted_noise={"picks_main": picks},
                               return_arrays=True)
    b, _ = pipe.generate_image("a cat", height=32, width=48,
                               num_inference_steps=2, resampling_steps=rs,
                               repaint_sampling=False, latents=lat0,
                               scripted_noise={"picks_main": picks},
                               return_arrays=True)
    np.testing.assert_array_equal(a, b)


def test_fused_scan_loop_matches_host_loop():
    """RuntimeConfig.fused_loop: single lax.scan program == host loop."""
    from elasticdiffusion_tpu.configs import RuntimeConfig
    import jax.numpy as jnp
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off", fused_loop=True)
    bundle = make_toy_bundle()
    kw = dict(height=32, width=32, num_inference_steps=2, resampling_steps=1,
              rrg_init_weight=500, rrg_stop_t=0.0, repaint_sampling=True,
              return_arrays=True)
    p_host = ElasticDiffusion(bundle=bundle)
    p_host.seed_everything(3)
    a, _ = p_host.generate_image("a cat", **kw)

    p_fused = ElasticDiffusion(bundle=bundle, runtime=rt)
    p_fused.seed_everything(3)
    b, _ = p_fused.generate_image("a cat", **kw)
    assert p_fused.last_metrics.get("fused") is True
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=5e-2)


def test_latent_checkpoint_resume(pipe, tmp_path):
    """Aux subsystem (SURVEY §5): long generations checkpoint
    (latent, key, step) and resume to the identical result."""
    ck = str(tmp_path / "ck.npz")
    kw = dict(height=16, width=16, num_inference_steps=4, resampling_steps=1,
              repaint_sampling=False, return_arrays=True)
    pipe.seed_everything(5)
    a, _ = pipe.generate_image("a cat", **kw)
    # same run, checkpointing after step index 2
    pipe.seed_everything(5)
    b, _ = pipe.generate_image("a cat", checkpoint_path=ck,
                               checkpoint_every=3, **kw)
    np.testing.assert_array_equal(a, b)
    # resume: steps 0-2 skipped, step 3 recomputed from the checkpoint
    pipe.seed_everything(5)
    c, _ = pipe.generate_image("a cat", resume_from=ck, **kw)
    np.testing.assert_array_equal(a, c)
