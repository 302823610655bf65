"""Background-padding table tests (SURVEY C10).

The table builder batches all (side, t) VAE encodes of one PadSpec into a
single compiled program per side (lax.map over the T axis) — the per-t
Python loop it replaced dispatched T remote VAE encodes per side, which
dominated the warm-run preamble (~14 s at T=3 on the tunnel backend) and
scaled linearly with step count. These tests pin down that the batched
build keeps the exact reference-style key derivation
(/root/reference/elastic_diffusion.py:321-391: per-(side-id, t) seeding)
and the documented fold_in deviation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elasticdiffusion_tpu.core.background import (
    PadSpec, make_background_table, pad_with_background, string_to_number)
from elasticdiffusion_tpu.sched.ddim import DDIMScheduler

from toy_configs import make_toy_bundle


@pytest.fixture(scope="module")
def bundle():
    return make_toy_bundle()


def test_mapped_rng_matches_per_t_derivation():
    """fold_in(fold_in(key, sid), t) under lax.map over traced t must equal
    the per-t concrete derivation bit-for-bit — table determinism and parity
    injection both depend on it."""
    key = jax.random.PRNGKey(42)
    spec = PadSpec(in_h=4, in_w=6, min_h=8, min_w=8)
    side, (ph, pw) = next(iter(spec.side_shapes().items()))
    sid = string_to_number(f"{side}_{ph}_{pw}")
    ts = np.asarray([981, 961, 941, 921, 901], np.int32)

    def draw(t):
        k = jax.random.fold_in(jax.random.fold_in(key, sid), t)
        kc, ke, kn = jax.random.split(k, 3)
        return (jax.random.uniform(kc, (1, 3, 1, 1)),
                jax.random.normal(ke, (1, 4, ph, pw)),
                jax.random.normal(kn, (1, 4, ph, pw)))

    mapped = jax.jit(lambda a: jax.lax.map(draw, a))(jnp.asarray(ts))
    for i, t in enumerate(ts):
        concrete = draw(int(t))
        for got, want in zip((m[i] for m in mapped), concrete):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_table_shapes_and_determinism(bundle):
    sch = DDIMScheduler()
    st = sch.set_timesteps(5)
    spec = PadSpec(in_h=4, in_w=6, min_h=8, min_w=8)
    key = jax.random.PRNGKey(7)
    t1 = make_background_table(bundle, np.asarray(st.timesteps), spec, key, sch)
    t2 = make_background_table(bundle, np.asarray(st.timesteps), spec, key, sch)
    assert set(t1) == {"3_1", "3_2", "2_1", "2_2"}
    for side, (ph, pw) in spec.side_shapes().items():
        assert t1[side].shape == (5, bundle.config.vae.latent_channels, ph, pw)
        np.testing.assert_array_equal(np.asarray(t1[side]),
                                      np.asarray(t2[side]))
    # different base key -> different tables
    t3 = make_background_table(bundle, np.asarray(st.timesteps), spec,
                               jax.random.PRNGKey(8), sch)
    assert float(jnp.abs(t3["3_1"] - t1["3_1"]).max()) > 1e-3


def test_sides_differ_and_steps_differ(bundle):
    """Each (side, t) pair draws independent color/noise — catching a key
    threading bug where all rows reuse one draw."""
    sch = DDIMScheduler()
    st = sch.set_timesteps(4)
    spec = PadSpec(in_h=4, in_w=4, min_h=8, min_w=8)
    tbl = make_background_table(bundle, np.asarray(st.timesteps), spec,
                                jax.random.PRNGKey(0), sch)
    a = np.asarray(tbl["2_1"])
    assert float(np.abs(a[0] - a[1]).max()) > 1e-3
    l, r = np.asarray(tbl["3_1"]), np.asarray(tbl["3_2"])
    assert float(np.abs(l[0] - r[0]).max()) > 1e-3


def test_pad_with_background_layout(bundle):
    """W-first-then-H concat order (reference ids 3_* then 2_*)."""
    sch = DDIMScheduler()
    st = sch.set_timesteps(2)
    spec = PadSpec(in_h=4, in_w=6, min_h=8, min_w=8)
    tbl = make_background_table(bundle, np.asarray(st.timesteps), spec,
                                jax.random.PRNGKey(3), sch)
    x = jnp.full((2, bundle.config.vae.latent_channels, 4, 6), 5.0)
    bgs = {s: tbl[s][0] for s in tbl}
    out = pad_with_background(x, spec, bgs)
    assert out.shape == (2, x.shape[1], 8, 8)
    l, r, t, b = spec.pads
    np.testing.assert_array_equal(
        np.asarray(out[:, :, t:8 - b, l:8 - r]), np.asarray(x))
    # corner regions must come from the H-axis ('2_*') backgrounds, which
    # span the already-W-padded width
    np.testing.assert_array_equal(np.asarray(out[0, :, :t, :]),
                                  np.asarray(tbl["2_1"][0]))
    np.testing.assert_array_equal(np.asarray(out[0, :, 8 - b:, :]),
                                  np.asarray(tbl["2_2"][0]))
