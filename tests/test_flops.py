"""Validate the analytic UNet FLOP model against XLA's cost analysis.

XLA counts every op (norms, softmax, GELU, elementwise) while
utils/flops.py counts only MXU work (convs/denses/attention dots), so the
analytic number must LOWER-bound XLA's and sit within a modest factor of
it. A wiring mistake in the walker (missed block, wrong resolution, wrong
skip channels) shifts the ratio far outside this band.
"""

import jax
import jax.numpy as jnp
import pytest

from elasticdiffusion_tpu.configs import UNET_SD1, UNET_SDXL, UNetConfig
from elasticdiffusion_tpu.models.unet import UNet2DCondition
from elasticdiffusion_tpu.utils.flops import unet_forward_flops


def _xla_flops(cfg: UNetConfig, hw: int) -> float:
    model = UNet2DCondition(cfg, use_pallas="off")
    x = jnp.zeros((1, cfg.in_channels, hw, hw), jnp.float32)
    t = jnp.float32(500.0)
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)

    def fwd(p, x_):
        return model.apply(p, x_, t, ctx)

    compiled = jax.jit(fwd).lower(params, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def test_flops_walker_vs_xla():
    cfg = UNetConfig(
        sample_size=16, block_out_channels=(32, 64, 96),
        down_block_has_attn=(True, True, False), layers_per_block=2,
        transformer_layers_per_block=(1, 2, 1), cross_attention_dim=48,
        attention_head_dim=(4, 4, 4))
    analytic = unet_forward_flops(cfg, 16, 16)
    xla = _xla_flops(cfg, 16)
    # analytic counts MXU work only: must not exceed XLA's total, and at
    # these widths the matmul share keeps it within 2x of it
    assert analytic <= xla * 1.01, (analytic, xla)
    assert xla <= 2.0 * analytic, (analytic, xla)


@pytest.mark.parametrize("cfg,hw,expected_gflops", [
    # SD1.5 at native 64x64 latent: ~680 GFLOPs/forward (public UNet
    # benchmarks quote ~0.7 TFLOPs at 512x512)
    (UNET_SD1, 64, (500, 900)),
    # SDXL at native 128x128 latent: ~5-7 TFLOPs/forward
    (UNET_SDXL, 128, (4000, 8000)),
])
def test_flops_magnitude_production(cfg, hw, expected_gflops):
    lo, hi = expected_gflops
    g = unet_forward_flops(cfg, hw, hw) / 1e9
    assert lo < g < hi, g


def test_stage_costs_param_bytes_match_model():
    """param_bytes must equal the real bf16 parameter bytes of the matmul/
    conv params (kernel+bias of Conv/Dense) in the actual Flax model —
    catching channel-bookkeeping drift between the walker and models/unet.py."""
    from elasticdiffusion_tpu.models.unet import UNet2DCondition
    from elasticdiffusion_tpu.utils.flops import unet_stage_costs

    cfg = UNetConfig(
        sample_size=8, block_out_channels=(32, 64),
        down_block_has_attn=(True, False), layers_per_block=2,
        transformer_layers_per_block=(2, 1), cross_attention_dim=48,
        attention_head_dim=(4, 4))
    model = UNet2DCondition(cfg, use_pallas="off")
    x = jnp.zeros((1, cfg.in_channels, 8, 8), jnp.float32)
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.float32(1.0), ctx)

    want = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = jax.tree_util.keystr(path)
        # conv/dense params only: LayerNorm/GroupNorm scale+bias ('norm' in
        # the module path) are VPU-side and excluded from the model
        if "kernel" in name or ("bias" in name and "norm" not in name.lower()):
            want += leaf.size * 2  # bf16 bytes
    got = sum(v["param_bytes"]
              for v in unet_stage_costs(cfg, 8, 8).values())
    assert got == want, (got, want)


def test_controlnet_costs_param_bytes_match_model():
    """ControlNet walker param bytes == the real Flax ControlNet's conv/dense
    parameter bytes (same filter as the UNet test)."""
    from elasticdiffusion_tpu.configs import ControlNetConfig
    from elasticdiffusion_tpu.models.controlnet import ControlNet
    from elasticdiffusion_tpu.utils.flops import controlnet_costs

    ucfg = UNetConfig(
        sample_size=8, block_out_channels=(32, 64),
        down_block_has_attn=(True, False), layers_per_block=2,
        transformer_layers_per_block=(2, 1), cross_attention_dim=48,
        attention_head_dim=(4, 4))
    cfg = ControlNetConfig(unet=ucfg, cond_downsample_factor=4,
                           conditioning_embedding_out_channels=(8, 16, 24))
    model = ControlNet(cfg, use_pallas="off")
    x = jnp.zeros((1, ucfg.in_channels, 8, 8), jnp.float32)
    ctx = jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.float32)
    cond = jnp.zeros((1, cfg.conditioning_channels, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.float32(1.0), ctx, cond)

    want = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = jax.tree_util.keystr(path)
        if "kernel" in name or ("bias" in name and "norm" not in name.lower()):
            want += leaf.size * 2
    got = controlnet_costs(cfg, 8, 8)["param_bytes"]
    assert got == want, (got, want)


def test_controlnet_flops_magnitude():
    """SDXL depth/canny ControlNet adds roughly 30-50% of a UNet forward
    (SURVEY §3.3: 'each UNet forward gains a preceding ControlNet forward
    (~ +40% FLOPs/view)')."""
    from elasticdiffusion_tpu.configs import ControlNetConfig
    from elasticdiffusion_tpu.utils.flops import controlnet_costs
    cn = controlnet_costs(ControlNetConfig(unet=UNET_SDXL), 128, 128)
    unet = unet_forward_flops(UNET_SDXL, 128, 128)
    assert 0.25 < cn["flops"] / unet < 0.6, cn["flops"] / unet


def test_roofline_bounds():
    from elasticdiffusion_tpu.utils.flops import (
        roofline_seconds, unet_stage_costs,
    )
    sc = unet_stage_costs(UNET_SDXL, 128, 128)
    # the deep transformer stages are compute-bound at production batch;
    # the thin full-res out head is HBM-bound
    assert roofline_seconds(sc["mid"], 16)["bound"] == "compute"
    assert roofline_seconds(sc["out"], 16)["bound"] == "hbm"
    r = roofline_seconds(sc["up_2"], 16)
    assert r["floor_s"] == max(r["compute_s"], r["hbm_s"])
