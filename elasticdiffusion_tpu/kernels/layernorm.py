"""Fused one-pass LayerNorm Pallas kernel for the transformer hot path.

The reference runs LayerNorm inside torch's TransformerBlock (diffusers
BasicTransformerBlock, /root/reference/elastic_diffusion.py:6-10 via
AttnProcessor2_0's host module); here every BasicTransformerBlock carries 3
fp32 LayerNorms over bf16 activations. SDXL's core stage executes ~180 of
them per merged forward at (B=20, S=1024, C=1280) — and the XLA lowering of
the fp32-upcast norm measured only ~390 GB/s two-way on the v5e chip
(artifacts/BLOCK_PROBE.json ln_bf16: 0.54 ms where one HBM round-trip costs
0.26 ms), i.e. the upcast round-trip materializes.

Unlike GroupNorm (stats over spatial x group, two kernels), LayerNorm
reduces only over the last axis: each row's statistics live entirely inside
one VMEM block, so a SINGLE streaming pass suffices — read a row chunk,
reduce in fp32 registers, normalize+affine, cast, write. One HBM read + one
write, no fp32 intermediate ever leaves VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, sb_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                   # (chunk, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps) * sb_ref[0] + sb_ref[1]
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_chunk(N: int, C: int, itemsize: int, budget: int = 1 << 20) -> int:
    """Largest divisor of N with chunk*C*itemsize under ~1MB (pipelined x2).

    Mosaic requires a block's second-to-last dim to be a multiple of 8 or
    equal to the whole array dim, so a partial chunk must stay 8-aligned;
    if no 8-aligned divisor fits the budget, fall back to the whole array
    (always legal — production shapes never reach that branch)."""
    max_rows = max(1, budget // (C * itemsize))
    if N <= max_rows:
        return N
    fits = [d for d in range(8, min(N, max_rows) + 1, 8) if N % d == 0]
    return max(fits) if fits else N


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     eps: float = 1e-5, interpret: bool = False) -> jnp.ndarray:
    """x: (..., C) any float dtype; scale/bias: (C,) fp32. Returns x.dtype.

    Statistics and the affine run in fp32 regardless of input dtype
    (nn.LayerNorm(dtype=fp32) contract of models/layers.py)."""
    orig_shape = x.shape
    C = orig_shape[-1]
    N = x.size // C
    xf = x.reshape(N, C)
    chunk = _pick_chunk(N, C, x.dtype.itemsize)
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(N // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=7 * N * C, bytes_accessed=2 * N * C * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xf, sb)
    return out.reshape(orig_shape)


def reference_layer_norm(x, scale, bias, eps=1e-5):
    """jnp reference (flax nn.LayerNorm(dtype=fp32) semantics) for tests."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - mean * mean
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
