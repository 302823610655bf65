"""Model-stack structural tests: shapes, determinism, conditioning hooks.

(Golden-activation parity vs the PyTorch stack needs real checkpoints, which
this zero-egress environment cannot fetch; the converter carries the mapping
and these tests pin the graph structure it maps onto.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toy_configs import make_toy_bundle, TOY_UNET, TOY_UNET_XL

from elasticdiffusion_tpu.models.unet import UNet2DCondition
from elasticdiffusion_tpu.models.vae import AutoencoderKL


@pytest.fixture(scope="module")
def bundle():
    return make_toy_bundle(xl=False)


@pytest.fixture(scope="module")
def bundle_xl():
    return make_toy_bundle(xl=True)


def test_unet_shapes_and_determinism(bundle):
    B, C, H, W = 2, 4, 8, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, H, W))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 16))
    out1 = bundle.apply_unet(x, jnp.asarray(500.0), ctx)
    out2 = bundle.apply_unet(x, jnp.asarray(500.0), ctx)
    assert out1.shape == (B, C, H, W)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # timestep changes the output
    out3 = bundle.apply_unet(x, jnp.asarray(10.0), ctx)
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6


def test_unet_context_sensitivity(bundle):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    c1 = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 16))
    c2 = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 16))
    o1 = bundle.apply_unet(x, jnp.asarray(500.0), c1)
    o2 = bundle.apply_unet(x, jnp.asarray(500.0), c2)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_unet_xl_added_cond(bundle_xl):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 40))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, 24))
    tids = jnp.asarray([[32., 32., 0., 0., 32., 32.]])
    out = bundle_xl.apply_unet(x, jnp.asarray(500.0), ctx,
                               added_text_embeds=pooled, added_time_ids=tids)
    assert out.shape == x.shape
    # time_ids must matter (micro-conditioning live)
    out2 = bundle_xl.apply_unet(x, jnp.asarray(500.0), ctx,
                                added_text_embeds=pooled,
                                added_time_ids=tids * 2)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6
    # missing added conds must fail loudly
    with pytest.raises(AssertionError):
        bundle_xl.apply_unet(x, jnp.asarray(500.0), ctx)


def test_unet_residual_count_matches_controlnet(bundle):
    """UNet down-residual count == ControlNet output count (injection contract,
    /root/reference/elastic_diffusion_w_controlnet.py:493-496)."""
    cfg = TOY_UNET
    expected = 1 + len(cfg.block_out_channels) * cfg.layers_per_block \
        + (len(cfg.block_out_channels) - 1)
    b = make_toy_bundle(controlnet="canny")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 16))
    cond = jnp.zeros((1, 3, 16, 16))  # latent 8x8 * toy vsf 2
    down, mid = b.apply_controlnet(x, jnp.asarray(500.0), ctx, cond)
    assert len(down) == expected
    # zero-convs -> fresh ControlNet returns exactly zero residuals
    assert all(float(jnp.abs(d).max()) == 0.0 for d in down)
    assert float(jnp.abs(mid).max()) == 0.0
    # injection runs and (with zero residuals) must not change the UNet output
    base = b.apply_unet(x, jnp.asarray(500.0), ctx)
    inj = b.apply_unet(x, jnp.asarray(500.0), ctx,
                       down_block_residuals=down, mid_block_residual=mid)
    np.testing.assert_allclose(np.asarray(base), np.asarray(inj), atol=1e-6)


def test_vae_roundtrip_shapes(bundle):
    B = 1
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 16, 24)) * 0.1
    noise = jnp.zeros((B, 4, 8, 12))
    z = bundle.vae_encode_sample(img, noise)
    assert z.shape == (B, 4, 8, 12)  # toy scale factor 2
    dec = bundle.vae_decode(z)
    assert dec.shape == (B, 3, 16, 24)
    # deterministic with fixed noise
    z2 = bundle.vae_encode_sample(img, noise)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))


def test_vae_encode_noise_injection(bundle):
    img = jnp.zeros((1, 3, 16, 16))
    z0 = bundle.vae_encode_sample(img, jnp.zeros((1, 4, 8, 8)))
    z1 = bundle.vae_encode_sample(img, jnp.ones((1, 4, 8, 8)))
    assert np.abs(np.asarray(z1) - np.asarray(z0)).max() > 0  # std > 0


def test_clip_outputs(bundle):
    ids = bundle.tokenizers[0](["a photo of a cat", ""])
    assert ids.shape == (2, 77)
    last, penult, pooled = bundle.encode_text(ids, 0)
    assert last.shape == (2, 77, 16)
    assert penult.shape == (2, 77, 16)
    assert pooled.shape == (2, 16)
    # penultimate != last (final layer + LN applied after)
    assert np.abs(np.asarray(last) - np.asarray(penult)).max() > 1e-6


def test_clip_projection_encoder(bundle_xl):
    ids = bundle_xl.tokenizers[1](["a photo of a cat"])
    last, penult, pooled = bundle_xl.encode_text(ids, 1)
    assert pooled.shape == (1, 24)  # projected
    assert last.shape == (1, 77, 24)


def test_clip_causality(bundle):
    """Changing a later token must not affect earlier positions (causal mask)."""
    ids1 = bundle.tokenizers[0](["a cat sat"])
    ids2 = ids1.copy()
    ids2[0, 40] = 123  # mutate a padding-region token
    _, p1, _ = bundle.encode_text(ids1, 0)
    _, p2, _ = bundle.encode_text(ids2, 0)
    np.testing.assert_allclose(np.asarray(p1)[0, :40], np.asarray(p2)[0, :40],
                               atol=1e-6)
    assert np.abs(np.asarray(p1)[0, 40:] - np.asarray(p2)[0, 40:]).max() > 1e-6


def test_tokenizer_layout():
    from elasticdiffusion_tpu.utils.tokenizer import CLIPTokenizer
    tok = CLIPTokenizer(vocab_size=256)
    ids = tok(["hello world"])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.bos_token_id
    assert tok.eos_token_id in ids[0]
    # deterministic
    np.testing.assert_array_equal(ids, tok(["hello world"]))
    # XL tokenizer_2 pads with 0
    tok2 = CLIPTokenizer(vocab_size=256, pad_token_id=0)
    assert tok2(["hi"])[0, -1] == 0


def test_param_dtype_policy():
    import jax.numpy as jnp
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from toy_configs import make_toy_bundle
    rt = RuntimeConfig(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                       use_pallas="off")
    b = make_toy_bundle(runtime=rt)
    leaf = jax.tree.leaves(b.unet_params)[0]
    assert leaf.dtype == jnp.bfloat16
    # VAE masters stay fp32
    vleaf = jax.tree.leaves(b.vae_params)[0]
    assert vleaf.dtype == jnp.float32


def test_scan_depth_matches_unrolled():
    """Transformer2D(scan_depth=True) over restacked params equals the
    unrolled module exactly at stack depth >= SCAN_MIN_DEPTH, and the
    segmented stages see the same params (RuntimeConfig.scan_depth
    contract; models/unet.py stack_transformer_scan_params)."""
    import dataclasses
    from elasticdiffusion_tpu.models.unet import (
        UNet2DCondition, stack_transformer_scan_params,
    )
    cfg = dataclasses.replace(TOY_UNET_XL,
                              transformer_layers_per_block=(1, 4))
    unrolled = UNet2DCondition(cfg, use_pallas="off", scan_depth=False)
    scanned = UNet2DCondition(cfg, use_pallas="off", scan_depth=True)

    key = jax.random.PRNGKey(0)
    s = cfg.sample_size
    sample = jax.random.normal(key, (2, cfg.in_channels, s, s))
    t = jnp.array([500.0, 200.0])
    ctx = jax.random.normal(jax.random.fold_in(key, 1),
                            (2, 77, cfg.cross_attention_dim))
    kw = dict(added_text_embeds=jnp.ones((2, cfg.pooled_projection_dim)),
              added_time_ids=jnp.ones((2, 6)))
    params = unrolled.init(key, sample, t, ctx, **kw)["params"]
    want = unrolled.apply({"params": params}, sample, t, ctx, **kw)

    stacked = stack_transformer_scan_params(params)
    # the deep (depth-4) stack moved to the scan layout, depth-1 untouched
    assert "blocks" in stacked["down_1_0"]["attn"], (
        "depth-4 stack should move to the scan layout")
    assert "blocks_0" not in stacked["down_1_0"]["attn"]
    got = scanned.apply({"params": stacked}, sample, t, ctx, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    # shallow stacks keep the unrolled names so SD1.x/2.x params pass through
    assert stack_transformer_scan_params({"blocks_0": {"w": jnp.ones(2)},
                                          "blocks_1": {"w": jnp.ones(2)}
                                          }).keys() == {"blocks_0", "blocks_1"}


def test_text_offload_roundtrip(bundle_xl):
    """offload_text_encoders must move every encoder tree to host (numpy
    leaves, freeing their HBM — the round-5 ControlNet-flagship headroom
    fix, RuntimeConfig.text_offload) and encode_text must transparently
    re-pin ON THE FIRST use with identical outputs — re-binding the device
    copy so one prompt's 2x(uncond,cond) encodes pay a single upload."""
    b = bundle_xl
    ids = b.tokenizers[0]("a photo of a cat")
    before = [np.asarray(b.encode_text(ids, i)[0]) for i
              in range(len(b.text_models))]

    moved = b.offload_text_encoders()
    assert moved == len(b.text_params)
    for p in b.text_params:
        assert all(isinstance(l, np.ndarray) and not isinstance(l, jax.Array)
                   for l in jax.tree.leaves(p)), "leaves must be host numpy"
    # idempotent: nothing device-resident left to move
    assert b.offload_text_encoders() == 0

    host_trees = list(b.text_params)
    after = [np.asarray(b.encode_text(ids, i)[0]) for i
             in range(len(b.text_models))]
    for w, g in zip(before, after):
        np.testing.assert_array_equal(w, g)
    # the flat-buffer path keeps the params HOST-resident permanently:
    # device residency is one packed buffer per dtype, unpacked inside the
    # forward jit (per-leaf device buffers each pay ~60 ms of tunnel
    # overhead — measured ~60-90 s/prompt for the ~1000-leaf SDXL duo)
    for hp, p in zip(host_trees, b.text_params):
        assert p is hp, "params must stay the same host trees"
    assert all(("flatdev", i) in b._text_host
               for i in range(len(b.text_params))), (
        "encode must leave the packed device buffers cached")

    # offload after an encode cycle frees the packed buffers (no device_get)
    assert b.offload_text_encoders() == len(b.text_params)
    assert not any(("flatdev", i) in b._text_host
                   for i in range(len(b.text_params)))
    # and a fresh encode cycle re-uploads and still matches
    again = [np.asarray(b.encode_text(ids, i)[0]) for i
             in range(len(b.text_models))]
    for w, g in zip(before, again):
        np.testing.assert_array_equal(w, g)
