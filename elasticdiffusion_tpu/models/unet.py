"""UNet2DCondition in Flax, covering SD1.x / SD2.x / SDXL from one config.

Behavioral contract (SURVEY §2.4.2; consumed by the reference at
/root/reference/elastic_diffusion.py:147, 393-432): epsilon-prediction UNet
with config fields sample_size / in_channels and, for SDXL, 'text_time'
added conditioning (pooled text embeds + 6 sinusoidal time-ids through
add_embedding). Residual injection hooks for ControlNet
(down_block_additional_residuals / mid_block_additional_residual,
/root/reference/elastic_diffusion_w_controlnet.py:493-496) are first-class
arguments.

TPU-first: NHWC layout, bf16 matmuls with fp32 norms, optional per-block
remat (`remat` flag — the memory analog of the reference's low_vram staging),
Pallas attention via kernels/attention.py. Public call takes NCHW to match
the pipeline/reference convention and transposes once at entry/exit.

SEGMENTED EXECUTION: `stage` selects a slice of the network ('stem',
'down_{i}', 'mid', 'up_{i}', 'out') so SD-scale models can run as a chain of
separately-jitted programs. This environment's remote XLA compile service
fails on single programs at full-SD size (broken pipe after ~1 h); per-block
programs compile in seconds-to-minutes and the only cost is HBM-resident
activations between segments. Param names are identical across stages, so
'full' and segmented execution share one checkpoint.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from elasticdiffusion_tpu.configs import UNetConfig
from elasticdiffusion_tpu.models.layers import (
    SCAN_MIN_DEPTH, Downsample2D, GroupNorm32, ResnetBlock2D,
    TimestepEmbedding, Transformer2D, Upsample2D, timestep_embedding,
)


def stack_transformer_scan_params(params):
    """Convert unrolled 'blocks_{i}' transformer params (the canonical
    checkpoint layout, models/convert.py) to the scan layout
    'blocks/block/...' with a leading depth axis, for any stack deep enough
    that Transformer2D(scan_depth=True) scans it (depth >= SCAN_MIN_DEPTH).
    Pure; shallow stacks and non-transformer subtrees pass through unchanged.
    """
    if not isinstance(params, dict):
        return params
    out = {k: stack_transformer_scan_params(v) for k, v in params.items()
           if not k.startswith("blocks_")}
    depth = sum(1 for k in params if k.startswith("blocks_"))
    if depth == 0:
        return out
    stacks = [params[f"blocks_{i}"] for i in range(depth)]
    if depth < SCAN_MIN_DEPTH:
        for i, s in enumerate(stacks):
            out[f"blocks_{i}"] = stack_transformer_scan_params(s)
        return out
    out["blocks"] = {"block": jax.tree.map(lambda *xs: jnp.stack(xs), *stacks)}
    return out


class CrossAttnBlock(nn.Module):
    """One (resnet, transformer) pair."""

    out_channels: int
    num_heads: int
    depth: int
    use_linear_projection: bool
    dtype: jnp.dtype
    use_pallas: str
    scan_depth: bool = False

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                          use_pallas=self.use_pallas, name="resnet")(x, temb)
        x = Transformer2D(self.num_heads, self.out_channels // self.num_heads,
                          depth=self.depth,
                          use_linear_projection=self.use_linear_projection,
                          dtype=self.dtype, use_pallas=self.use_pallas,
                          scan_depth=self.scan_depth, name="attn")(x, context)
        return x


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "auto"
    remat: bool = False
    scan_depth: bool = False

    def _maybe_remat(self, mod_cls):
        if self.remat:
            return nn.remat(mod_cls, static_argnums=())
        return mod_cls

    @nn.compact
    def __call__(self, sample_nchw=None, timesteps=None,
                 encoder_hidden_states=None,
                 added_text_embeds=None, added_time_ids=None,
                 down_block_residuals: Optional[Sequence[jnp.ndarray]] = None,
                 mid_block_residual: Optional[jnp.ndarray] = None,
                 stage: str = "full", hidden=None, emb=None, skips=None):
        """stage='full': sample_nchw (B,C,H,W) + timesteps + context -> eps.

        Segmented stages (hidden/emb NHWC, internal dtype):
          'stem'    (sample_nchw, timesteps, added_*) -> (h, emb)
          'down_i'  (hidden, emb, context)            -> (h, (res...,))
          'mid'     (hidden, emb, context[, mid_block_residual]) -> h
          'up_i'    (hidden, emb, context, skips)     -> h
          'out'     (hidden,)                         -> eps (B,C,H,W)
        """
        cfg = self.config
        bo = cfg.block_out_channels
        n_blocks = len(bo)
        Res = self._maybe_remat(ResnetBlock2D)
        CA = self._maybe_remat(CrossAttnBlock)
        context = None if encoder_hidden_states is None else \
            encoder_hidden_states.astype(self.dtype)

        def make_emb(B):
            t = timesteps
            if jnp.ndim(t) == 0:
                t = jnp.broadcast_to(t, (B,))
            t_emb = timestep_embedding(t, bo[0], cfg.flip_sin_to_cos,
                                       cfg.freq_shift)
            temb_dim = bo[0] * 4
            e = TimestepEmbedding(temb_dim, dtype=self.dtype,
                                  name="time_embedding")(t_emb.astype(self.dtype))
            if cfg.addition_embed_type == "text_time":
                assert added_text_embeds is not None and added_time_ids is not None, (
                    "SDXL requires added_cond (text_embeds, time_ids)")
                tid = added_time_ids.reshape(-1)
                tid_emb = timestep_embedding(tid, cfg.addition_time_embed_dim,
                                             cfg.flip_sin_to_cos, cfg.freq_shift)
                tid_emb = tid_emb.reshape(B, -1)
                add_in = jnp.concatenate(
                    [added_text_embeds.astype(jnp.float32), tid_emb], axis=-1)
                assert add_in.shape[-1] == cfg.projection_class_embeddings_input_dim, (
                    f"add-embed dim {add_in.shape[-1]} != "
                    f"{cfg.projection_class_embeddings_input_dim}")
                e = e + TimestepEmbedding(temb_dim, dtype=self.dtype,
                                          name="add_embedding")(
                                              add_in.astype(self.dtype))
            return e

        def stem(x_nchw):
            x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(self.dtype)
            return nn.Conv(bo[0], (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, name="conv_in")(x)

        def down_block(i, x, e):
            outs = []
            for j in range(cfg.layers_per_block):
                if cfg.down_block_has_attn[i]:
                    x = CA(bo[i], cfg.heads_for_block(i),
                           cfg.transformer_layers_per_block[i],
                           cfg.use_linear_projection, self.dtype,
                           self.use_pallas, self.scan_depth,
                           name=f"down_{i}_{j}")(x, e, context)
                else:
                    x = Res(bo[i], dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            name=f"down_{i}_{j}_resnet")(x, e)
                outs.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(bo[i], dtype=self.dtype,
                                 name=f"down_{i}_downsample")(x)
                outs.append(x)
            return x, tuple(outs)

        def mid_block(x, e):
            x = Res(bo[-1], dtype=self.dtype, use_pallas=self.use_pallas,
                    name="mid_resnet_0")(x, e)
            x = Transformer2D(cfg.heads_for_block(n_blocks - 1),
                              bo[-1] // cfg.heads_for_block(n_blocks - 1),
                              depth=cfg.transformer_layers_per_block[-1],
                              use_linear_projection=cfg.use_linear_projection,
                              dtype=self.dtype, use_pallas=self.use_pallas,
                              scan_depth=self.scan_depth,
                              name="mid_attn")(x, context)
            x = Res(bo[-1], dtype=self.dtype, use_pallas=self.use_pallas,
                    name="mid_resnet_1")(x, e)
            if mid_block_residual is not None:
                # residuals are NHWC (our ControlNet's native layout)
                x = x + mid_block_residual.astype(x.dtype)
            return x

        def up_block(i, x, e, sk):
            sk = list(sk)
            for j in range(cfg.layers_per_block + 1):
                x = jnp.concatenate([x, sk.pop()], axis=-1)
                if cfg.down_block_has_attn[i]:
                    x = CA(bo[i], cfg.heads_for_block(i),
                           cfg.transformer_layers_per_block[i],
                           cfg.use_linear_projection, self.dtype,
                           self.use_pallas, self.scan_depth,
                           name=f"up_{i}_{j}")(x, e, context)
                else:
                    x = Res(bo[i], dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            name=f"up_{i}_{j}_resnet")(x, e)
            if i > 0:
                x = Upsample2D(bo[i], dtype=self.dtype,
                               name=f"up_{i}_upsample")(x)
            return x

        def out_block(x):
            x = GroupNorm32(use_pallas=self.use_pallas, silu=True,
                            name="conv_norm_out")(x)
            x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="conv_out")(x)
            return jnp.transpose(x, (0, 3, 1, 2))

        # ---- segmented stages ----
        if stage == "stem":
            x = stem(sample_nchw)
            return x, make_emb(x.shape[0])
        if stage.startswith("down_"):
            return down_block(int(stage[5:]), hidden.astype(self.dtype),
                              emb.astype(self.dtype))
        if stage == "mid":
            return mid_block(hidden.astype(self.dtype), emb.astype(self.dtype))
        if stage.startswith("up_"):
            return up_block(int(stage[3:]), hidden.astype(self.dtype),
                            emb.astype(self.dtype),
                            [s.astype(self.dtype) for s in skips])
        if stage == "out":
            return out_block(hidden.astype(self.dtype))
        # merged stages: fewer dispatches in the segmented chain (the shallow
        # blocks individually underfill a program; see registry.py
        # apply_unet_segmented merge plan)
        if stage.startswith("front_"):
            # stem + down blocks 0..k inclusive -> (h, emb, residuals)
            k = int(stage[6:])
            x = stem(sample_nchw)
            e = make_emb(x.shape[0])
            residuals = [x]
            for i in range(k + 1):
                x, outs = down_block(i, x, e)
                residuals.extend(outs)
            return x, e, tuple(residuals)
        if stage.startswith("tail_"):
            # up blocks k..0 + out head; skips = flattened residuals for
            # blocks k..0 in stack order (popped back-to-front)
            k = int(stage[5:])
            x = hidden.astype(self.dtype)
            e = emb.astype(self.dtype)
            sk = [s.astype(self.dtype) for s in skips]
            for i in reversed(range(k + 1)):
                cnt = cfg.layers_per_block + 1
                mine, sk = sk[-cnt:], sk[:-cnt]
                x = up_block(i, x, e, mine)
            return out_block(x)
        # deeper merges (RuntimeConfig.segment_merge_core): the deep blocks
        # k+1..n-1 plus mid — and for 'full_core' their up twins — as ONE
        # program, cutting 1-2 dispatch roundtrips per chain. The core's up
        # blocks consume one residual produced OUTSIDE it (block k's
        # downsample output, same spatial res as block k+1) — passed as the
        # single element of `skips`.
        if stage.startswith("downmid_"):
            # down blocks k+1..n-1 + mid -> (h, residuals produced here)
            k = int(stage[8:])
            x = hidden.astype(self.dtype)
            e = emb.astype(self.dtype)
            res = []
            for i in range(k + 1, n_blocks):
                x, outs = down_block(i, x, e)
                res.extend(outs)
            return mid_block(x, e), tuple(res)
        if stage.startswith("core_"):
            # down blocks k+1..n-1 + mid + up blocks n-1..k+1 -> h
            k = int(stage[5:])
            x = hidden.astype(self.dtype)
            e = emb.astype(self.dtype)
            res = [s.astype(self.dtype) for s in skips]  # [downsample_k]
            for i in range(k + 1, n_blocks):
                x, outs = down_block(i, x, e)
                res.extend(outs)
            x = mid_block(x, e)
            for i in reversed(range(k + 1, n_blocks)):
                cnt = cfg.layers_per_block + 1
                mine, res = res[-cnt:], res[:-cnt]
                x = up_block(i, x, e, mine)
            return x
        assert stage == "full", f"unknown stage {stage}"

        # ---- full forward ----
        x = stem(sample_nchw)
        e = make_emb(x.shape[0])
        residuals = [x]
        for i in range(n_blocks):
            x, outs = down_block(i, x, e)
            residuals.extend(outs)

        if down_block_residuals is not None:
            assert len(down_block_residuals) == len(residuals), (
                f"expected {len(residuals)} down residuals, "
                f"got {len(down_block_residuals)}")
            # residuals are NHWC (our ControlNet's native layout)
            residuals = [r + a.astype(r.dtype)
                         for r, a in zip(residuals, down_block_residuals)]

        x = mid_block(x, e)

        for i in reversed(range(n_blocks)):
            k = cfg.layers_per_block + 1
            sk, residuals = residuals[-k:], residuals[:-k]
            x = up_block(i, x, e, sk)
        return out_block(x)
