"""Fused GroupNorm(+SiLU) Pallas kernels.

GroupNorm is the UNet's dominant non-matmul cost: unfused it reads the
activation once for stats and once to normalize, with an fp32 upcast
round-trip through HBM when activations are bf16. Here the norm is two
pipelined Pallas kernels over row chunks:

  1. _stats_kernel: grid (B, n_chunks), sequential-grid reduction of
     per-channel sum / sum-of-squares (fp32 accumulation in VMEM);
  2. _apply_kernel: grid (B, n_chunks), streaming normalize+affine(+SiLU)
     with the per-batch (1, C) scale/shift staying resident.

The group reduce/broadcast between them is a tiny jnp stage ((B,C) ->
(B,groups) -> (B,C)). Chunks are sized ~1MB so the automatic BlockSpec
pipeline double-buffers within VMEM at any activation size (the previous
whole-(S,C)-in-VMEM design hit the 16MB scoped-vmem limit at SD shapes).
Channel-group reshapes never touch the lane dimension inside a kernel —
Mosaic cannot layout-cast (S, C) -> (S, G, gs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sums_ref):
    """Accumulate per-channel [sum; sum_sq] over row chunks.

    x_ref: (1, chunk, C) VMEM block; sums_ref: (1, 2, C) fp32, revisited by
    every chunk step of one batch row (TPU grid is sequential)."""
    j = pl.program_id(1)
    rows = x_ref[0].astype(jnp.float32)                       # (chunk, C)
    s1 = jnp.sum(rows, axis=0, keepdims=True)
    s2 = jnp.sum(rows * rows, axis=0, keepdims=True)
    part = jnp.concatenate([s1, s2], axis=0)                  # (2, C)

    @pl.when(j == 0)
    def _init():
        sums_ref[0] = part

    @pl.when(j > 0)
    def _acc():
        sums_ref[0] = sums_ref[0] + part


def _apply_kernel(x_ref, scale_ref, shift_ref, o_ref, *, silu: bool):
    """out = x * scale + shift (optionally SiLU), streaming over chunks."""
    rows = x_ref[0].astype(jnp.float32)
    out = rows * scale_ref[0] + shift_ref[0]
    if silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_chunks(S: int, C: int, itemsize: int, budget: int = 1 << 20):
    """Row-chunk size targeting ~1MB VMEM blocks (pipelined x2 by pallas).

    Falls back to the largest divisor of S under the budget — halving alone
    strands large odd S as one whole-(S, C) block, silently defeating the
    VMEM budget the two-kernel design exists to enforce (ADVICE r2)."""
    max_rows = max(1, budget // (C * itemsize))
    if S <= max_rows:
        return S, 1
    chunk = S
    while chunk > max_rows and chunk % 2 == 0:
        chunk //= 2
    if chunk > max_rows:
        # odd residue: best divisor of S that fits (1 always does)
        chunk = max(d for d in range(1, min(S, max_rows) + 1) if S % d == 0)
    return chunk, S // chunk


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu",
                                             "interpret"))
def fused_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     groups: int, eps: float = 1e-5, silu: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """x: (B, H, W, C) NHWC any float dtype; scale/bias: (C,) fp32.

    Returns x.dtype. Stats and normalize run in fp32 regardless of input
    dtype (matching GroupNorm32's fp32 contract)."""
    B, H, W, C = x.shape
    assert C % groups == 0
    gs = C // groups
    S = H * W
    chunk, n_chunks = _pick_chunks(S, C, x.dtype.itemsize)
    xf = x.reshape(B, S, C)

    sums = pl.pallas_call(
        _stats_kernel,
        grid=(B, n_chunks),
        in_specs=[pl.BlockSpec((1, chunk, C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        interpret=interpret,
    )(xf)

    # tiny jnp stage: per-batch group moments -> per-channel scale/shift.
    # The (B, C) -> (B, groups) reshape is fine in XLA (it is the in-kernel
    # lane reshape Mosaic rejects).
    cnt = jnp.float32(S * gs)
    s1 = sums[:, 0, :].reshape(B, groups, gs).sum(-1)          # (B, G)
    s2 = sums[:, 1, :].reshape(B, groups, gs).sum(-1)
    mean = s1 / cnt
    var = s2 / cnt - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, gs, axis=-1)                     # (B, C)
    inv_c = jnp.repeat(inv, gs, axis=-1)
    scale_c = scale.astype(jnp.float32)[None] * inv_c
    shift_c = bias.astype(jnp.float32)[None] - mean_c * scale_c

    out = pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=interpret,
    )(xf, scale_c[:, None, :], shift_c[:, None, :])
    return out.reshape(B, H, W, C)


def reference_group_norm(x, scale, bias, groups, eps=1e-5, silu=False):
    """jnp reference for tests."""
    B, H, W, C = x.shape
    gs = C // groups
    xf = x.astype(jnp.float32).reshape(B, H * W, groups, gs)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out.reshape(B, H, W, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)
