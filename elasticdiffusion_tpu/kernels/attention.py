"""Attention dispatch: Pallas flash attention on TPU, jnp reference elsewhere.

The reference delegates attention to diffusers' AttnProcessor2_0 (torch SDPA,
/root/reference/elastic_diffusion.py:6-10). Here the hot path is a Pallas
flash-attention kernel (kernels/flash_attention.py); the jnp path is the
numerically-defining reference used on CPU and in tests.

Layout: (B, S, H, D) — batch, sequence, heads, head_dim.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 256  # below this the XLA fused path is already optimal


def _use_pallas(mode: str) -> bool:
    if mode == "off":
        return False
    if mode == "on":
        return True
    return jax.default_backend() == "tpu"


def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        causal: bool = False) -> jnp.ndarray:
    """Numerically-defining jnp attention; softmax in fp32."""
    B, Sq, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        Sk = k.shape[1]
        mask = jnp.tril(jnp.ones((Sq, Sk), dtype=bool), k=Sk - Sq)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


@functools.lru_cache(maxsize=1)
def _flash_fn():
    from elasticdiffusion_tpu.kernels.flash_attention import flash_attention
    return flash_attention


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          causal: bool = False,
                          use_pallas: str = "auto") -> jnp.ndarray:
    """(B, Sq, H, D) x (B, Sk, H, D) -> (B, Sq, H, D).

    Flash engages for long, non-causal queries with lane-friendly head dims
    (all SD family head dims qualify: 40/64/80/160). Short KEYS are fine:
    cross-attention (Sk=77 text tokens) takes the one-shot kernel with the
    keys padded to one lane and masked in VMEM — the XLA fallback
    materializes (B,H,Sq,77) fp32 logits in HBM, ~1 ms x 70 instances per
    SDXL merged forward. No silent fallback: a failing kernel must fail
    loudly — the XLA path materializes O(S^2) logits and OOMs exactly where
    flash matters most.
    """
    import os
    short_k_ok = (k.shape[1] >= _FLASH_MIN_SEQ
                  or os.environ.get("ED_CROSSATTN_FLASH", "on") != "off")
    if (_use_pallas(use_pallas) and q.shape[1] >= _FLASH_MIN_SEQ
            and short_k_ok and q.shape[-1] % 8 == 0 and not causal):
        return _flash_fn()(q, k, v)
    return reference_attention(q, k, v, causal=causal)
