"""C4-C9 geometry/resample ops vs the GENUINE reference implementation.

VERDICT r1 item 5: round-1 oracles (tests/oracles.py) are transcriptions; a
shared misreading would pass. Here the oracle is the reference's own code,
imported from /root/reference/elastic_diffusion.py (see reference_import.py)
and driven with recorded torch randomness, so our fused static-plan gathers
are checked against the actual reference tensor math:

  get_views                 /root/reference/elastic_diffusion.py:197-229
  crop_with_context         :706-757
  random_downsample         :522-558
  random_nearest_downsample :560-630 (incl. multi-step exclude/drop threading
                            :661-684 — the full resampling state machine)
  nearest_interpolate       :868-883
  fill_in_from_downsampled_direction :633-647
  get_downsample_size       :943-950
  to_even_rational          :468-476
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from elasticdiffusion_tpu.configs import ViewConfig
from elasticdiffusion_tpu.ops.resample import (
    apply_resample, build_resample_plan, fill_in, get_downsample_size,
    nearest_pick_indices, to_even_rational,
)
from elasticdiffusion_tpu.ops.resize import nearest_resize
from elasticdiffusion_tpu.ops.views import build_view_plan, gather_views, get_views_latent

from reference_import import make_ref


@pytest.fixture(scope="module")
def ref():
    return make_ref()


# ---------------------------------------------------------------- C6: views

@pytest.mark.parametrize("H,W,ws,stride", [
    (512, 768, 32, 32), (1024, 2048, 64, 64), (2048, 2048, 64, 64),
    (384, 512, 48, 48), (520, 776, 32, 32),
    # extreme aspect ratios (reference example table, app_gradio.py:111-120)
    (512, 2048, 64, 64), (2048, 512, 64, 64), (1920, 1080, 64, 64),
])
def test_get_views_vs_reference(ref, H, W, ws, stride):
    want = ref.get_views(H, W, h_ws=ws, w_ws=ws, stride=stride)
    got = get_views_latent(H // 8, W // 8, ws, ws, stride)
    assert got == want


# ------------------------------------------------- C7: crop_with_context

@pytest.mark.parametrize("H,W,window,ctx", [
    (64, 96, 32, 32),    # SD1.5 512x768
    (128, 256, 64, 64),  # SDXL 1024x2048 (H collapses)
    (256, 256, 64, 64),  # SDXL 2048x2048
    (96, 96, 32, 32),
    (64, 96, 48, 16),    # custom patch size
    # extreme aspect ratios: one axis collapses while the other fans out 4x
    (64, 256, 64, 64),   # SDXL 512x2048
    (256, 64, 64, 64),   # SDXL 2048x512
    (240, 135, 64, 64),  # SDXL 1920x1080 (odd latent width)
])
def test_view_crops_vs_reference(ref, H, W, window, ctx):
    vc = ViewConfig(window_size=window, stride=window, context_size=ctx)
    plan = build_view_plan(H, W, vc)
    x = np.random.default_rng(0).standard_normal((1, 4, H, W)).astype(np.float32)
    xt = torch.from_numpy(x)

    h_ws = H if window + ctx >= H else window
    w_ws = W if window + ctx >= W else window
    want_views = ref.get_views(H * 8, W * 8, h_ws=h_ws, w_ws=w_ws, stride=window)
    assert list(plan.views) == want_views

    got = np.asarray(gather_views(jnp.asarray(x), plan))
    for v, (a, b, c, d) in enumerate(want_views):
        want, margins = ref.crop_with_context(xt, a, b, c, d, S=1, n=ctx // 2)
        np.testing.assert_array_equal(got[v], want.numpy())
        assert tuple(plan.margins[v]) == margins


# ------------------------------------------------------ C9: nearest resize

@pytest.mark.parametrize("shape,size,flips", [
    ((1, 4, 42, 64), (64, 96), (False, False)),
    ((1, 4, 64, 96), (42, 64), (False, False)),
    ((2, 3, 16, 16), (42, 64), (True, False)),
    ((1, 1, 42, 64), (64, 96), (False, True)),
    ((1, 2, 9, 9), (23, 11), (True, True)),
])
def test_nearest_resize_vs_reference(ref, shape, size, flips):
    x = np.random.default_rng(1).standard_normal(shape).astype(np.float32)
    want = ref.nearest_interpolate(torch.from_numpy(x), size=size,
                                   bottom=flips[0], right=flips[1]).numpy()
    got = np.asarray(nearest_resize(jnp.asarray(x), size,
                                    bottom=flips[0], right=flips[1]))
    np.testing.assert_array_equal(got, want)


# ------------------------------------------- C4 helpers: rationals & sizes

def test_to_even_rational_vs_reference(ref):
    for f in [42 / 64, 64 / 128, 52 / 100, 40 / 76, 1.0, 0.999, 13 / 17,
              5 / 16, 2 / 3]:
        assert to_even_rational(f) == ref.to_even_rational(f)


def test_downsample_size_vs_reference():
    for sd_version, native in [("2.0", 512), ("XL1.0", 1024)]:
        r = make_ref(sd_version=sd_version)
        for H, W in [(512, 768), (1024, 1024), (2048, 2048), (1024, 2048),
                     (768, 768), (512, 512), (1536, 1536), (2048, 1536),
                     (512, 2048), (2048, 512), (1920, 1080), (1080, 1920),
                     (768, 2048), (2048, 768)]:
            assert get_downsample_size(H, W, native) == r.get_downsample_size(H, W)


# ------------------------- C4+C5: randomized downsample, injected indices

RESAMPLE_SHAPES = [
    ((64, 96), (42, 64)),     # SD1.5 512x768
    ((128, 128), (64, 64)),   # SD2.1 1024x1024
    ((256, 256), (128, 128)), # SDXL 2048x2048
    ((128, 256), (64, 128)),  # SDXL 1024x2048
    ((100, 76), (52, 40)),    # awkward rationals
    ((134, 128), (64, 64)),   # effective-size shrink quirk
    # extreme aspect ratios from the reference example table
    # (/root/reference/app_gradio.py:111,119-120) — 4:1 both orientations
    # and 16:9; these stress to_even_rational/keep-block geometry hardest
    ((64, 256), (32, 128)),   # SDXL H=512,  W=2048 (1:4)
    ((256, 64), (128, 32)),   # SDXL H=2048, W=512  (4:1)
    ((240, 135), (128, 72)),  # SDXL H=1920, W=1080 (16:9 portrait)
    ((96, 256), (48, 128)),   # SDXL H=768,  W=2048
]


@pytest.mark.parametrize("in_hw,out_hw", RESAMPLE_SHAPES)
def test_random_nearest_downsample_vs_reference(in_hw, out_hw):
    """Run the REAL random_nearest_downsample (torch-seeded), capture its
    sampled indices, and require our fused gather to reproduce the
    downsampled output and mask exactly."""
    H, W = in_hw
    h, w = out_hw
    r = make_ref()  # fresh: random_downasmple_pre caches per-shape plans
    x = np.random.default_rng(7).standard_normal((1, 4, H, W)).astype(np.float32)
    xt = torch.from_numpy(x)
    plan = build_resample_plan(H, W, h, w)

    torch.manual_seed(123)
    for step in range(3):
        nearest = step == 0
        want_d, want_m, ri = r.random_nearest_downsample(
            xt, (h, w), drop_p=0.7, nearest=nearest)
        got_d, got_m = apply_resample(jnp.asarray(x), plan,
                                      jnp.asarray(ri.numpy().astype(np.int32)))
        np.testing.assert_array_equal(np.asarray(got_d), want_d.numpy())
        np.testing.assert_array_equal(np.asarray(got_m), want_m.numpy())
        if nearest:
            got_near = apply_resample(jnp.asarray(x), plan,
                                      nearest_pick_indices(plan.num_blocks))
            np.testing.assert_array_equal(np.asarray(got_near[0]), want_d.numpy())


def test_resampling_state_machine_vs_reference():
    """Replicate the reference's full multi-step resampling state threading
    (/root/reference/elastic_diffusion.py:661-684): exclude-mask accumulation,
    drop-p mixing with prev indices, NaN-sentinel fill — using the reference's
    own randomness, injected into our index-driven ops."""
    H, W, h, w = 64, 96, 42, 64
    rs = 4
    r = make_ref()
    x = np.random.default_rng(11).standard_normal((1, 4, H, W)).astype(np.float32)
    xt = torch.from_numpy(x)
    plan = build_resample_plan(H, W, h, w)

    def fake_direction(d):  # stand-in for obtain_latent_direction: pure fn
        return d * 2.0 + 1.0

    torch.manual_seed(999)
    exclude = None
    prev_ri = None
    target = torch.full_like(xt, float("nan")).half()
    # ours: explicit (value, filled) pair instead of the NaN sentinel
    got_t = jnp.zeros_like(jnp.asarray(x))
    got_f = jnp.zeros((H, W), bool)
    for step in range(rs + 1):
        want_d, want_m, prev_ri = r.random_nearest_downsample(
            xt, (h, w), prev_random_indices=prev_ri, drop_p=0.7,
            exclude_mask=exclude, nearest=(step == 0))
        if exclude is None:
            exclude = torch.zeros((len(prev_ri), 4), dtype=torch.bool)
        exclude[torch.arange(len(prev_ri)), prev_ri] = True

        ri = jnp.asarray(prev_ri.numpy().astype(np.int32))
        got_d, got_m = apply_resample(jnp.asarray(x), plan, ri)
        np.testing.assert_array_equal(np.asarray(got_d), want_d.numpy())
        np.testing.assert_array_equal(np.asarray(got_m), want_m.numpy())

        direction = fake_direction(want_d)
        target = r.fill_in_from_downsampled_direction(
            target, direction, want_m, fill_all=(step == rs))
        got_t, got_f = fill_in(got_t, got_f, fake_direction(got_d), got_m,
                               fill_all=(step == rs))

    want = target.float().numpy()
    assert not np.isnan(want).any()
    assert bool(got_f.all())
    np.testing.assert_allclose(np.asarray(got_t), want, rtol=0, atol=1e-6)


def test_rrg_autograd_vs_analytic():
    """C12: the reference computes the RRG gradient by PER-SAMPLE torch
    autograd on `rrg_scale * mse_loss` with the sign flipped
    (/root/reference/elastic_diffusion.py:926-938); the rebuild replaces it
    with the closed form 2*rrg_scale*(up(ref_x0) - x0)/numel
    (core/signals.py reduced_resolution_guidance). This drives the GENUINE
    reference method through its cached-scores path (donwsampled_scores —
    sic — skips the UNet; only the scheduler.step is stubbed with the same
    DDIM coefficients both sides receive) and requires equality. B=2 pins
    the per-sample numel of the MSE mean (VERDICT r3 missing #2)."""
    from elasticdiffusion_tpu.core.signals import reduced_resolution_guidance

    r = make_ref()
    rng = np.random.default_rng(21)
    B, C, H, W, h, w = 2, 4, 24, 16, 12, 8
    x0 = rng.standard_normal((B, C, H, W)).astype(np.float32)
    lat = rng.standard_normal((B, C, h, w)).astype(np.float32)
    eps_u = rng.standard_normal((B, C, h, w)).astype(np.float32)
    ddir = rng.standard_normal((B, C, h, w)).astype(np.float32)
    g, rrg = 7.5, 1234.0
    coeffs = (0.8, 0.6, 0.9, 0.43589)  # sqrt(a_t), sqrt(1-a_t), prev pair

    class _Sched:  # DDIM step from shared coeffs (sched/ddim.py unit-tested)
        def step(self, mo, t, sample):
            sa_t, s1a_t, sa_p, s1a_p = coeffs
            x0_ = (sample - s1a_t * mo) / sa_t
            return {"pred_original_sample": x0_,
                    "prev_sample": sa_p * x0_ + s1a_p * mo}

    object.__setattr__(r, "scheduler", _Sched())
    want, _ = r.reduced_resolution_guidance(
        global_latent=torch.zeros(B), t=0, global_direction=None,
        latent_x0_original=torch.from_numpy(x0),
        uncond_text_embeds=None, negative_pooled_prompt_embeds=None,
        view_config=None, guidance_scale=g, rrg_scale=rrg,
        downsample_size=(h, w),
        donwsampled_scores={"latent": torch.from_numpy(lat),
                            "direction": torch.from_numpy(ddir),
                            "uncond_score": torch.from_numpy(eps_u)})

    got, got_ref_x0 = reduced_resolution_guidance(
        jnp.asarray(x0), jnp.asarray(lat), jnp.asarray(eps_u),
        jnp.asarray(ddir), g, rrg, jnp.asarray(coeffs, jnp.float32))
    # fp32: autograd's mean-reduction order differs from the closed form's
    # single division; identical to ~1e-7 relative (values reach ~20)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-6, atol=1e-6)
    assert got.shape == x0.shape and got_ref_x0.shape == lat.shape


def test_random_downsample_factor2_vs_reference():
    """The inner plain random_downsample (factor 2, no rational resize)
    against our identity-size plan path, with the reference's indices."""
    H, W = 32, 48
    r = make_ref()
    x = np.random.default_rng(3).standard_normal((1, 4, H, W)).astype(np.float32)
    xt = torch.from_numpy(x)
    torch.manual_seed(5)
    want_d, want_m, ri = r.random_downsample(xt, 2)
    # our equivalent: plan for (H,W) -> (H//2, W//2) degenerates to the plain
    # 2x2-block pick when the rational resize is identity
    plan = build_resample_plan(H, W, H // 2, W // 2)
    got_d, got_m = apply_resample(jnp.asarray(x), plan,
                                  jnp.asarray(ri.numpy().astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(got_d), want_d.numpy())
    np.testing.assert_array_equal(np.asarray(got_m), want_m.numpy())
