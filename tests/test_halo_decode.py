"""Halo decode correctness (SURVEY §4.5).

Multi-chip shard_map mode is EXACT (per-conv halo exchange + psum'd GroupNorm
moments over disjoint bands). Single-chip sequential bands are an
approximation (per-band GN stats, same class as the reference's tiles) —
tested with tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toy_configs import make_toy_bundle

from elasticdiffusion_tpu.parallel.halo_decode import halo_decode, _stage_b
from elasticdiffusion_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope="module")
def bundle():
    return make_toy_bundle()


def test_stage_split_equals_full(bundle):
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
    full = bundle.vae.apply({"params": bundle.vae_params}, lat,
                            method=type(bundle.vae).decode)
    a = bundle.vae.apply({"params": bundle.vae_params}, lat,
                         method=type(bundle.vae).decode_stage_a)
    b = bundle.vae.apply({"params": bundle.vae_params}, a,
                         method=type(bundle.vae).decode_stage_b)
    np.testing.assert_allclose(np.asarray(b), np.asarray(full),
                               atol=1e-6, rtol=1e-6)


def test_functional_stage_b_matches_flax(bundle):
    """The functional distributed stage B (n=1) must equal the flax module.
    Tolerance note: different XLA fusion of the same math amplifies through
    the toy model's GroupNorms (~1e-3-level); real VAEs are far tamer. The
    sharded-vs-functional test below is the tight equality check (same
    fusion)."""
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
    want = bundle.vae_decode(lat)
    got = halo_decode(bundle, lat, mesh=None, num_bands=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=5e-2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_halo_exact_on_mesh(bundle):
    """Sharded decode == functional monolithic decode: same functional code,
    so this isolates halo-exchange + psum-GN correctness tightly."""
    mesh = make_mesh((1, 8))
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32, 16))
    want = halo_decode(bundle, lat, mesh=None, num_bands=1)
    got = halo_decode(bundle, lat, mesh=mesh)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)
    # and close to the flax monolithic decode (fusion-noise tolerance)
    flax_want = bundle.vae_decode(lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(flax_want),
                               atol=5e-3, rtol=5e-2)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_halo_exact_on_mesh_full_vae_architecture():
    """VERDICT r2 #8: halo-vs-monolithic equality on the 8-device mesh at a
    NON-TOY configuration — the full SD VAE decoder architecture
    (128/256/512/512) at latent 64x64 -> 512x512 RGB."""
    import jax.numpy as jnp
    from elasticdiffusion_tpu.configs import RuntimeConfig, get_bundle_config
    from elasticdiffusion_tpu.models.registry import load_bundle
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off")
    b = load_bundle("1.5", runtime=rt, bundle_config=get_bundle_config("1.5"))
    mesh = make_mesh((1, 8))
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 64, 64)) * 0.5
    want = halo_decode(b, lat, mesh=None, num_bands=1)  # functional monolithic
    got = halo_decode(b, lat, mesh=mesh)
    assert got.shape == want.shape == (1, 3, 512, 512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)
    # and against the flax monolithic decode (separately-compiled program)
    flax_want = b.vae_decode(lat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(flax_want),
                               atol=1e-3, rtol=1e-2)


def test_streamed_stage_b_exact(bundle):
    """EXACT streamed stage B (global GN moments, chunked compute) must match
    the functional monolithic stage B tightly — same math, only the
    chunking/fusion differs."""
    lat = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 32, 16)) * 0.5
    want = halo_decode(bundle, lat, mesh=None, num_bands=1)
    got = halo_decode(bundle, lat, mesh=None, streamed=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_streamed_stage_b_exact_full_vae_architecture():
    """Streamed-vs-monolithic equality at the full SD VAE decoder
    architecture (128/256/512/512), latent 32x64 -> 256x512 RGB."""
    from elasticdiffusion_tpu.configs import RuntimeConfig, get_bundle_config
    from elasticdiffusion_tpu.models.registry import load_bundle
    rt = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                       use_pallas="off")
    b = load_bundle("1.5", runtime=rt, bundle_config=get_bundle_config("1.5"))
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 32, 64)) * 0.5
    want = halo_decode(b, lat, mesh=None, num_bands=1)
    got = halo_decode(b, lat, mesh=None, streamed=True)
    assert got.shape == want.shape == (1, 3, 256, 512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)


def test_sequential_bands_approximate(bundle):
    """Per-band GN stats: approximate, but interior must be close and output
    finite/seamless in shape."""
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 32, 16)) * 0.2
    want = np.asarray(bundle.vae_decode(lat))
    got = np.asarray(halo_decode(bundle, lat, mesh=None, halo=12, num_bands=4))
    assert got.shape == want.shape
    assert np.isfinite(got).all()
    # same order of magnitude everywhere (GN-stat shift only)
    assert np.abs(got - want).mean() < 0.3


def test_pipeline_halo_decoder_path(bundle):
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    pipe = ElasticDiffusion(bundle=bundle)
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16, 16))
    plain = np.asarray(pipe.decode_latents(lat))
    halo = np.asarray(pipe.halo_decode(lat))
    np.testing.assert_allclose(halo, plain, atol=5e-3, rtol=5e-2)
