"""Exact-equality tests of the fused randomized-downsample vs numpy oracles
(SURVEY §4.1, hard part #2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elasticdiffusion_tpu.ops.resample import (
    apply_resample, build_resample_plan, fill_in, get_downsample_size,
    mix_with_prev, nearest_pick_indices, sample_pick_indices, to_even_rational,
    update_exclude_mask,
)

import oracles


# real config shape pairs (SURVEY §2.2):
#   SD1.5 512x768  -> latent (64,96)  -> down (42,64)
#   SD2.1 1024x1024-> latent (128,128)-> down (64,64)
#   SDXL 2048x2048 -> latent (256,256)-> down (128,128)
#   SDXL 1024x2048 -> latent (128,256)-> down (64,128)
SHAPE_PAIRS = [
    ((64, 96), (42, 64)),
    ((128, 128), (64, 64)),
    ((256, 256), (128, 128)),
    ((128, 256), (64, 128)),
    ((96, 96), (64, 64)),     # SD 768x768
    ((64, 64), (64, 64)),     # native size (identity resample)
    ((100, 76), (52, 40)),    # awkward rationals
    ((16, 24), (5, 8)),       # odd target; duplicate split positions hit the
                              # reference's restore pointer-desync quirk
    ((134, 128), (64, 64)),   # effective-size shrink quirk (67->64 per axis)
]


def test_downsample_size_table():
    assert get_downsample_size(512, 768, 512) == (42, 64)
    assert get_downsample_size(1024, 1024, 512) == (64, 64)
    assert get_downsample_size(2048, 2048, 1024) == (128, 128)
    assert get_downsample_size(1024, 2048, 1024) == (64, 128)
    assert get_downsample_size(768, 768, 512) == (64, 64)
    assert get_downsample_size(512, 512, 512) == (64, 64)


def test_to_even_rational_matches_oracle():
    for f in [42 / 64, 64 / 128, 128 / 256, 52 / 100, 40 / 76, 1.0, 0.999, 13 / 17]:
        assert to_even_rational(f) == oracles.to_even_rational(f)
        n, d = to_even_rational(f)
        assert n % 2 == 0 and d % 2 == 0


@pytest.mark.parametrize("in_hw,out_hw", SHAPE_PAIRS)
def test_resample_matches_oracle(in_hw, out_hw):
    H, W = in_hw
    h, w = out_hw
    plan = build_resample_plan(H, W, h, w)
    rng = np.random.default_rng(42)
    x = rng.standard_normal((1, 4, H, W)).astype(np.float32)

    for seed in range(3):
        r = np.random.default_rng(seed).integers(0, 4, h * w).astype(np.int32)
        want_d, want_m = oracles.random_nearest_downsample_given_indices(x, (h, w), r)
        got_d, got_m = apply_resample(jnp.asarray(x), plan, jnp.asarray(r))
        np.testing.assert_array_equal(np.asarray(got_d), want_d)
        np.testing.assert_array_equal(np.asarray(got_m), want_m)


def test_nearest_pick_is_deterministic_downsample():
    """step 0 (fix_initial) picks the top-left of each block
    (/root/reference/elastic_diffusion.py:535-536)."""
    H, W, h, w = 64, 96, 42, 64
    plan = build_resample_plan(H, W, h, w)
    x = np.random.default_rng(0).standard_normal((1, 4, H, W)).astype(np.float32)
    r = nearest_pick_indices(plan.num_blocks)
    want_d, want_m = oracles.random_nearest_downsample_given_indices(
        x, (h, w), np.zeros(h * w, np.int32))
    got_d, got_m = apply_resample(jnp.asarray(x), plan, r)
    np.testing.assert_array_equal(np.asarray(got_d), want_d)
    np.testing.assert_array_equal(np.asarray(got_m), want_m)


def test_identity_resample_at_native_size():
    """At native size the chain reduces to identity and a full mask."""
    plan = build_resample_plan(64, 64, 64, 64)
    x = np.random.default_rng(1).standard_normal((1, 4, 64, 64)).astype(np.float32)
    for r in [np.zeros(64 * 64, np.int32),
              np.random.default_rng(2).integers(0, 4, 64 * 64).astype(np.int32)]:
        d, m = apply_resample(jnp.asarray(x), plan, jnp.asarray(r))
        np.testing.assert_array_equal(np.asarray(d), x)
        assert np.asarray(m).all()


def test_exclude_mask_sampling():
    key = jax.random.PRNGKey(0)
    n = 4096
    excl = np.zeros((n, 4), bool)
    excl[:, 0] = True  # 0 always excluded
    excl[0, :] = True  # fully excluded row -> uniform fallback
    pick = np.asarray(sample_pick_indices(key, jnp.asarray(excl), n))
    assert pick.shape == (n,) and pick.dtype == np.int32
    assert (pick[1:] != 0).all()
    # roughly uniform over {1,2,3}
    counts = np.bincount(pick[1:], minlength=4)[1:]
    assert counts.min() > n / 3 * 0.85
    # accumulate: after marking picks, those entries are excluded next round
    excl2 = np.asarray(update_exclude_mask(jnp.asarray(excl), jnp.asarray(pick)))
    assert excl2[np.arange(n), pick].all()
    pick2 = np.asarray(sample_pick_indices(jax.random.PRNGKey(1), jnp.asarray(excl2), n))
    collision = (pick2[1:] == pick[1:]).mean()
    assert collision < 0.02  # only the fallback row may repeat


def test_mix_with_prev_rate():
    key = jax.random.PRNGKey(0)
    n = 20000
    new = jnp.zeros((n,), jnp.int32)
    prev = jnp.ones((n,), jnp.int32)
    mixed = np.asarray(mix_with_prev(key, new, prev, drop_p=0.7))
    rate = mixed.mean()  # fraction kept from prev
    assert abs(rate - 0.7) < 0.02
    # drop_p=0 -> all new; drop_p=1 -> all prev
    assert np.asarray(mix_with_prev(key, new, prev, 0.0)).sum() == 0
    assert np.asarray(mix_with_prev(key, new, prev, 1.0)).sum() == n


@pytest.mark.parametrize("fill_all", [False, True])
def test_fill_in_matches_nan_oracle(fill_all):
    H, W, h, w = 64, 96, 42, 64
    rng = np.random.default_rng(5)
    direction = rng.standard_normal((1, 4, h, w)).astype(np.float32)
    mask = rng.random((H, W)) < 0.3
    prev_vals = rng.standard_normal((1, 4, H, W)).astype(np.float32)
    prev_filled = rng.random((H, W)) < 0.4

    # oracle state: NaN where unfilled
    target_nan = np.where(prev_filled, prev_vals, np.nan)
    want = oracles.fill_in_nan(target_nan, direction, mask, fill_all)

    got_t, got_f = fill_in(jnp.asarray(prev_vals), jnp.asarray(prev_filled),
                           jnp.asarray(direction), jnp.asarray(mask), fill_all)
    got_t, got_f = np.asarray(got_t), np.asarray(got_f)
    want_filled = ~np.isnan(want)
    if fill_all:
        assert got_f.all() and want_filled.all()
        np.testing.assert_array_equal(got_t, want)
    else:
        np.testing.assert_array_equal(np.broadcast_to(got_f, want.shape), want_filled)
        np.testing.assert_array_equal(got_t[np.broadcast_to(got_f, want.shape)],
                                      want[want_filled])
