"""Distributed tests on the virtual 8-device CPU mesh (SURVEY §4.5):
sharding-invariance of the local signal and the full step, plus the driver
entry points."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toy_configs import make_toy_bundle

from elasticdiffusion_tpu.configs import RuntimeConfig
from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
from elasticdiffusion_tpu.parallel.sharding import make_mesh


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@requires_8
def test_mesh_construction():
    mesh = make_mesh((1, 8))
    assert mesh.shape == {"data": 1, "views": 8}
    mesh2 = make_mesh((2, 4))
    assert mesh2.shape == {"data": 2, "views": 4}
    assert make_mesh((1, 1)) is None


@requires_8
def test_sharding_invariance_full_step():
    """Same seed => same output on 1 device and on an 8-device mesh."""
    import jax.numpy as jnp
    rt1 = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                        use_pallas="off", mesh_shape=(1, 1))
    rt8 = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                        use_pallas="off", mesh_shape=(1, 8))
    kw = dict(height=32, width=48, num_inference_steps=2, resampling_steps=1,
              repaint_sampling=True, rrg_init_weight=1000, rrg_stop_t=0.0,
              return_arrays=True)

    p1 = ElasticDiffusion(bundle=make_toy_bundle(runtime=rt1), runtime=rt1)
    p1.seed_everything(7)
    a, _ = p1.generate_image("a cat", **kw)

    p8 = ElasticDiffusion(bundle=make_toy_bundle(runtime=rt8), runtime=rt8)
    assert p8.mesh is not None
    p8.seed_everything(7)
    b, _ = p8.generate_image("a cat", **kw)

    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


@requires_8
def test_dryrun_multichip():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out, key, aux = jax.jit(fn)(*args)
    assert out.shape == args[0].shape
    assert bool(jnp.isfinite(out).all())


@requires_8
def test_segmented_mesh_pad_sharding():
    """A merged estimate batch that does NOT divide the mesh width must be
    padded and genuinely sharded P('views') — never silently replicated
    (VERDICT r2 weak #1). Also asserts sharded == single-device output."""
    from jax.sharding import PartitionSpec as P
    rt1 = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                        use_pallas="off", mesh_shape=(1, 1),
                        segmented_step="on")
    rt8 = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                        use_pallas="off", mesh_shape=(1, 8),
                        segmented_step="on")
    # 32x48 -> latent 16x24 -> V=24 views, rs=2 -> merged batch 2*3+24 = 30;
    # repaint 2+24 = 26. Neither divides 8: the silent-replication shape class.
    kw = dict(height=32, width=48, num_inference_steps=2, resampling_steps=2,
              repaint_sampling=True, rrg_init_weight=1000, rrg_stop_t=0.0,
              return_arrays=True)

    p1 = ElasticDiffusion(bundle=make_toy_bundle(runtime=rt1), runtime=rt1)
    p1.seed_everything(7)
    a, _ = p1.generate_image("a cat", **kw)

    p8 = ElasticDiffusion(bundle=make_toy_bundle(runtime=rt8), runtime=rt8)
    assert p8.mesh is not None
    p8.seed_everything(7)
    b, _ = p8.generate_image("a cat", **kw)

    steps = [s for pair in p8._step_cache.values() for s in pair
             if s is not None]
    assert steps, "segmented step cache empty"
    for s in steps:
        sh = s.debug.get("last_unet_input_sharding")
        nb = s.debug.get("last_unet_input_batch")
        assert nb is not None and nb % 8 == 0, (
            f"UNet batch {nb} not padded to the 8-wide mesh")
        assert sh is not None and sh.spec == P("views"), (
            f"UNet input not sharded over views: {None if sh is None else sh.spec}")

    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


@requires_8
def test_data_views_mesh_invariance_b2():
    """Combined ('data','views') = (2,4) mesh with a 2-prompt batch: the
    prompt batch shards over 'data' (sharding.shard_batch) while the merged
    view/substep fan-out shards over 'views' — output must equal the
    single-device run exactly (same key threading)."""
    rt1 = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                        use_pallas="off", mesh_shape=(1, 1))
    rt24 = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                         use_pallas="off", mesh_shape=(2, 4))
    kw = dict(height=32, width=48, num_inference_steps=2, resampling_steps=1,
              repaint_sampling=True, rrg_init_weight=1000, rrg_stop_t=0.0,
              return_arrays=True)
    prompts = ["a cat", "a dog"]

    p1 = ElasticDiffusion(bundle=make_toy_bundle(runtime=rt1), runtime=rt1)
    p1.seed_everything(7)
    a, _ = p1.generate_image(prompts, **kw)

    p24 = ElasticDiffusion(bundle=make_toy_bundle(runtime=rt24), runtime=rt24)
    assert p24.mesh is not None and p24.mesh.shape == {"data": 2, "views": 4}
    p24.seed_everything(7)
    b, _ = p24.generate_image(prompts, **kw)

    assert np.asarray(a).shape[0] == 2
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


def test_direction_batch_sharding_invariance():
    """The batched resampling substeps (signals.approximate_latent_direction)
    shard over the 'views' axis; output must equal the unsharded run."""
    import jax.numpy as jnp
    from toy_configs import make_toy_bundle
    from elasticdiffusion_tpu.core import signals
    from elasticdiffusion_tpu.core.background import PadSpec
    from elasticdiffusion_tpu.ops.resample import build_resample_plan
    from elasticdiffusion_tpu.parallel.sharding import make_mesh

    b = make_toy_bundle()
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 24))
    plan = build_resample_plan(16, 24, 8, 12)
    pad = PadSpec(plan.out_h, plan.out_w, 8, 8)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 16))
    key = jax.random.PRNGKey(2)

    def run(mesh):
        fn = jax.jit(lambda l, k: signals.approximate_latent_direction(
            b, l, k, jnp.float32(500.0), ctx, plan, pad, {},
            resampling_steps=3, drop_p=0.7, mesh=mesh))
        if mesh is None:
            return fn(lat, key)
        with mesh:
            return fn(lat, key)

    base = run(None)
    mesh = make_mesh((1, 8))
    sharded = run(mesh)
    np.testing.assert_allclose(np.asarray(sharded.direction),
                               np.asarray(base.direction),
                               atol=2e-5, rtol=1e-4)


@requires_8
def test_warm_start_mesh_exact_cache_hit():
    """warm_start under a >1 'views' mesh: jit caches key on COMMITTED input
    shardings, so the warm dummies must carry the same sharding the jitted
    pre glue stamps on the production x_in — asserted the same way as the
    single-device test (zero post-warm cache growth), plus numerics vs the
    unwarmed meshed pipeline."""
    from elasticdiffusion_tpu.core.entry import make_denoise_step
    rt8 = RuntimeConfig(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                        use_pallas="off", mesh_shape=(1, 8),
                        segmented_step="on")
    pipe = ElasticDiffusion(bundle=make_toy_bundle(runtime=rt8), runtime=rt8,
                            verbose=False)
    assert pipe.mesh is not None
    step, (lat, key, inp), _ = make_denoise_step(
        pipe, 32, 48, num_inference_steps=2, guidance_scale=7.5,
        resampling_steps=1, new_p=0.3, repaint=True, segmented=True)
    n = step.warm_start()
    assert n >= 4
    cache = pipe.bundle.__dict__["_jit_cache"]
    sizes = {k: v._cache_size() for k, v in cache.items()
             if k.startswith("unet_seg_")}
    out, _, _ = step(lat, key, inp)
    assert bool(jnp.isfinite(out).all())
    sizes_after = {k: v._cache_size() for k, v in cache.items()
                   if k.startswith("unet_seg_")}
    assert sizes_after == sizes, (
        "meshed warm-up missed the production sharding/signature: "
        f"{sizes} -> {sizes_after}")
