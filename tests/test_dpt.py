"""DPT depth estimator: golden test vs the genuine transformers torch
implementation with shared (converted) weights, plus the preprocessors
plumbing (SURVEY C21 depth; VERDICT round-1 missing #1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elasticdiffusion_tpu.models.dpt import (
    DPT_TEST, DPTDepthModel, make_depth_fn,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _small_torch_dpt():
    from transformers import DPTConfig, DPTForDepthEstimation
    cfg = DPTConfig(hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
                    intermediate_size=64, image_size=64, patch_size=16,
                    backbone_out_indices=[0, 1, 2, 3],
                    neck_hidden_sizes=[16, 24, 32, 32], fusion_hidden_size=24,
                    readout_type="project", is_hybrid=False,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    m = DPTForDepthEstimation(cfg).eval()
    # random-init heads land in the dead-ReLU region (output identically 0,
    # which would make the golden comparison vacuous) — bias them positive
    with torch.no_grad():
        m.head.head[2].bias += 0.5
        m.head.head[4].bias += 0.5
    return m


def test_dpt_matches_transformers_golden():
    from elasticdiffusion_tpu.models.convert import convert_dpt
    tm = _small_torch_dpt()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_dpt(sd, DPT_TEST)

    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).predicted_depth.numpy()

    model = DPTDepthModel(DPT_TEST)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 64, 64)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 2e-4, (
        np.abs(got - want).max(), scale)


def test_dpt_structure_matches_init():
    """Converted tree == random-init tree structurally."""
    from elasticdiffusion_tpu.models.convert import convert_dpt
    tm = _small_torch_dpt()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_dpt(sd, DPT_TEST)
    model = DPTDepthModel(DPT_TEST)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))["params"]
    flat_c = jax.tree_util.tree_leaves_with_path(params)
    flat_i = jax.tree_util.tree_leaves_with_path(init)
    pc = {jax.tree_util.keystr(p): l.shape for p, l in flat_c}
    pi = {jax.tree_util.keystr(p): l.shape for p, l in flat_i}
    assert pc == pi


def test_dpt_arbitrary_size_pos_embed():
    """Non-native sizes resize the position embedding grid (torch parity
    is at native size; this checks the path runs and is finite)."""
    model = DPTDepthModel(DPT_TEST)
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))["params"]
    out = model.apply({"params": p}, jnp.zeros((1, 3, 96, 128)))
    assert out.shape == (1, 96, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_depth_preprocessor_plumbing():
    """process_condition_image('depth') runs end-to-end with the built-in
    estimator hook (random-init DPT) — no external callable needed."""
    from elasticdiffusion_tpu.apps.preprocessors import process_condition_image
    img = (np.random.RandomState(0).rand(80, 120, 3) * 255).astype(np.uint8)
    fn = make_depth_fn(config=DPT_TEST, proc_size=64)
    out = process_condition_image(img, "depth", depth_fn=fn)
    arr = np.asarray(out)
    assert arr.shape == (80, 120, 3)
    assert arr.dtype == np.uint8
    assert (arr[..., 0] == arr[..., 1]).all()
