"""CLIP text encoders in Flax (ViT-L/14, ViT-H/14, ViT-bigG/14 w/ projection).

Behavioral contract (SURVEY §2.4.4; consumed at
/root/reference/elastic_diffusion.py:248-265):
  - non-XL: final hidden state after the last LayerNorm ([0] of the HF output)
  - XL: hidden_states[-2] of BOTH encoders (the PENULTIMATE layer output,
    which in HF is the un-normed input to the last layer), concatenated to
    768+1280=2048; pooled output = text projection of the EOS-position
    feature of encoder 2 (CLIPTextModelWithProjection[0])
  - causal attention mask; 77-token padded inputs

So the encoder returns (last_hidden_state, penultimate_hidden_state,
pooled/projected) in one pass.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from elasticdiffusion_tpu.configs import CLIPTextConfig
from elasticdiffusion_tpu.kernels.attention import dot_product_attention


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=jnp.float32, name=name)
        h = ln("layer_norm1")(x.astype(jnp.float32)).astype(x.dtype)
        B, S, C = h.shape
        heads, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(B, S, heads, hd)
        k = k.reshape(B, S, heads, hd)
        v = v.reshape(B, S, heads, hd)
        attn = dot_product_attention(q, k, v, causal=True, use_pallas="off")
        attn = nn.Dense(C, dtype=self.dtype, name="out_proj")(
            attn.reshape(B, S, C))
        x = x + attn
        h = ln("layer_norm2")(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """input_ids: (B, 77) int32.

        Returns (last_hidden_state, penultimate_hidden_state, pooled):
          last_hidden_state  (B, 77, C) — after final LN
          penultimate        (B, 77, C) — HF hidden_states[-2] (pre final layer)
          pooled             (B, C or projection_dim) — EOS feature (projected
                             when the config has a projection head)
        """
        cfg = self.config
        B, S = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       dtype=self.dtype, name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        x = tok + pos[None, :S, :].astype(self.dtype)

        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)

        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="final_layer_norm")(
                                x.astype(jnp.float32)).astype(x.dtype)

        # pooled = feature at the EOS position. HF (pinned 4.34 behavior) uses
        # argmax(input_ids): the first occurrence of the highest token id,
        # which is the first EOS for CLIP vocabularies.
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(B), eos_idx]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=self.dtype, name="text_projection")(pooled)
        return last, penultimate, pooled
