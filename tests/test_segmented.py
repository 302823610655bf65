"""Segmented UNet execution must equal the full forward exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from toy_configs import make_toy_bundle


def test_segmented_matches_full():
    b = make_toy_bundle()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 12))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 16))
    t = jnp.float32(500.0)
    full = b.apply_unet(x, t, ctx)
    seg = b.apply_unet_segmented(x, t, ctx)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def test_segmented_xl_with_controlnet_residuals():
    b = make_toy_bundle(xl=True, controlnet="canny")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 40))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, 24))
    tids = jnp.asarray([[32., 32., 0., 0., 32., 32.]])
    cond = jnp.zeros((1, 3, 16, 16))  # latent 8x8 * toy vsf 2
    down, mid = b.apply_controlnet(x, jnp.float32(500.0), ctx, cond,
                                   added_text_embeds=pooled,
                                   added_time_ids=tids)
    full = b.apply_unet(x, jnp.float32(500.0), ctx, added_text_embeds=pooled,
                        added_time_ids=tids, down_block_residuals=down,
                        mid_block_residual=mid)
    seg = b.apply_unet_segmented(x, jnp.float32(500.0), ctx,
                                 added_text_embeds=pooled,
                                 added_time_ids=tids,
                                 down_block_residuals=down,
                                 mid_block_residual=mid)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(full),
                               atol=2e-5, rtol=1e-4)
