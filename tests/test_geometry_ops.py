"""Exact-equality tests of the fused geometry ops vs the numpy oracles
(SURVEY §4.1): views, context crops, first-writer writeback, nearest resize."""

import numpy as np
import jax.numpy as jnp
import pytest

from elasticdiffusion_tpu.configs import ViewConfig
from elasticdiffusion_tpu.ops.resize import nearest_resize
from elasticdiffusion_tpu.ops.views import (
    build_view_plan, gather_views, get_views, get_views_latent,
    scatter_first_writer,
)

import oracles


@pytest.mark.parametrize("shape,size,flips", [
    ((1, 4, 13, 17), (26, 34), (False, False)),
    ((1, 4, 13, 17), (7, 5), (False, False)),
    ((2, 3, 16, 16), (42, 64), (True, False)),
    ((1, 1, 42, 64), (64, 96), (False, True)),
    ((1, 2, 9, 9), (9, 9), (True, True)),
    ((1, 1, 128, 128), (256, 256), (False, False)),
])
def test_nearest_resize_vs_oracle(shape, size, flips):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    want = oracles.nearest_interpolate(x, size, bottom=flips[0], right=flips[1])
    got = np.asarray(nearest_resize(jnp.asarray(x), size,
                                    bottom=flips[0], right=flips[1]))
    np.testing.assert_array_equal(got, want)


def test_nearest_resize_vs_torch():
    """Cross-check the floor-index semantics against torch itself."""
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    for shape, size in [((1, 4, 42, 64), (64, 96)), ((1, 4, 64, 96), (42, 64)),
                        ((2, 3, 10, 7), (23, 11))]:
        x = rng.standard_normal(shape).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=size, mode="nearest").numpy()
        got = np.asarray(nearest_resize(jnp.asarray(x), size))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("H,W,ws,stride", [
    (64, 96, 32, 32), (128, 256, 64, 64), (256, 256, 64, 64),
    (48, 64, 48, 48), (65, 97, 32, 32),
])
def test_get_views_vs_oracle(H, W, ws, stride):
    assert get_views_latent(H, W, ws, ws, stride) == oracles.get_views(H, W, ws, ws, stride)


def test_get_views_pixel_space_validation():
    with pytest.raises(ValueError):
        get_views(511, 512)
    assert get_views(512, 768, h_ws=32, w_ws=32, stride=32) == \
        oracles.get_views(64, 96, 32, 32, 32)


@pytest.mark.parametrize("H,W,window,ctx", [
    (64, 96, 32, 32),    # SD1.5 512x768
    (128, 256, 64, 64),  # SDXL 1024x2048
    (96, 96, 32, 32),    # SD 768x768
    (42, 64, 32, 32),    # collapsed H (window+ctx >= H)
    (32, 32, 32, 32),    # fully collapsed
    (64, 96, 48, 16),    # custom patch_size
])
def test_view_plan_crops_match_oracle(H, W, window, ctx):
    vc = ViewConfig(window_size=window, stride=window, context_size=ctx)
    plan = build_view_plan(H, W, vc)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, H, W)).astype(np.float32)

    h_ws = H if window + ctx >= H else window
    w_ws = W if window + ctx >= W else window
    views = oracles.get_views(H, W, h_ws, w_ws, window)
    assert list(plan.views) == views

    got = np.asarray(gather_views(jnp.asarray(x), plan))
    for v, (a, b, c, d) in enumerate(views):
        want, margins = oracles.crop_with_context(x, a, b, c, d, S=1, n=ctx // 2)
        np.testing.assert_array_equal(got[v], want)
        assert tuple(plan.margins[v]) == margins


@pytest.mark.parametrize("H,W,window,ctx", [
    (64, 96, 32, 32), (128, 256, 64, 64), (42, 64, 32, 32), (96, 96, 32, 32),
])
def test_first_writer_writeback_matches_oracle(H, W, window, ctx):
    vc = ViewConfig(window_size=window, stride=window, context_size=ctx)
    plan = build_view_plan(H, W, vc)
    rng = np.random.default_rng(3)
    out_h, out_w = plan.out_shape
    # nonzero preds so the oracle's !=0 test means "not yet written"
    preds = rng.standard_normal((plan.num_views, 1, 4, out_h, out_w)).astype(np.float32) + 5.0

    want = oracles.local_writeback((1, 4, H, W), list(plan.views),
                                   [tuple(m) for m in plan.margins], preds)
    got = np.asarray(scatter_first_writer(jnp.asarray(preds), plan))
    np.testing.assert_array_equal(got, want)


def test_view_counts_sdxl():
    """SDXL 2048x2048 -> 16 views. At 1024x2048 the reference's collapse rule
    (/root/reference/elastic_diffusion.py:821-825: window+context >= extent)
    triggers for H (64+64 >= 128), so the H axis collapses: 1x4 = 4 views of
    128x64 (+W context only). SURVEY §2.2's '8 views' claim missed this."""
    vc = ViewConfig.from_sample_size(128)
    assert build_view_plan(256, 256, vc).num_views == 16
    assert build_view_plan(256, 256, vc).out_shape == (128, 128)
    p = build_view_plan(128, 256, vc)
    assert p.num_views == 4
    # H collapsed (no vertical context), W gets 2*(ctx//2)=64 context cols
    assert p.out_shape == (128, 128)
    assert all(m[0] == 0 and m[1] == 0 for m in p.margins)


def test_view_plan_owner_is_first_view():
    vc = ViewConfig(window_size=32, stride=32, context_size=32)
    plan = build_view_plan(65, 64, vc)  # snap-back makes last row overlap
    # overlapping pixels must belong to the earlier view
    claimed = np.zeros((65, 64), bool)
    for v, (a, b, c, d) in enumerate(plan.views):
        region_owner = plan.owner_view[a:b, c:d]
        new = ~claimed[a:b, c:d]
        assert (region_owner[new] == v).all()
        claimed[a:b, c:d] = True
