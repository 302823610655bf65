"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm dominates the UNet's non-matmul time: each call reads the full
activation twice (stats pass + normalize pass) when unfused. This kernel
computes group moments and applies normalize+affine+SiLU in one VMEM-resident
pass over rows, grid over batch.

Layout: NHWC with C divisible by the group count; operates per batch element
(one grid step holds (H*W, C) in VMEM — UNet tiles at native resolution are
at most 128*128*320*4B = 20MB at the top level, so rows are chunked).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float,
            silu: bool, n_chunks: int, chunk: int):
    C = x_ref.shape[-1]
    gs = C // groups
    # pass 1: accumulate moments over row chunks
    s1 = jnp.zeros((1, groups), jnp.float32)
    s2 = jnp.zeros((1, groups), jnp.float32)

    def acc(i, carry):
        s1, s2 = carry
        rows = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        r = rows.reshape(chunk, groups, gs)
        return (s1 + jnp.sum(r, axis=(0, 2))[None, :],
                s2 + jnp.sum(r * r, axis=(0, 2))[None, :])

    s1, s2 = jax.lax.fori_loop(0, n_chunks, acc, (s1, s2))
    cnt = jnp.float32(n_chunks * chunk * gs)
    mean = s1 / cnt                       # (1, groups)
    var = s2 / cnt - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    mean_c = jnp.repeat(mean, gs, axis=1)  # (1, C)
    inv_c = jnp.repeat(inv, gs, axis=1)
    scale = scale_ref[:].astype(jnp.float32) * inv_c
    shift = bias_ref[:].astype(jnp.float32) - mean_c * scale

    def norm(i, _):
        rows = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        out = rows * scale + shift
        if silu:
            out = out * jax.nn.sigmoid(out)
        o_ref[0, pl.ds(i * chunk, chunk), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm, 0)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu",
                                             "interpret"))
def fused_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     groups: int, eps: float = 1e-5, silu: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """x: (B, H, W, C) NHWC; scale/bias: (C,). Returns same shape/dtype."""
    B, H, W, C = x.shape
    assert C % groups == 0
    S = H * W
    chunk = S
    # keep each VMEM chunk under ~2MB fp32
    max_rows = max(1, (2 * 1024 * 1024) // (C * 4))
    n_chunks = 1
    while chunk > max_rows and chunk % 2 == 0:
        chunk //= 2
        n_chunks *= 2
    xf = x.reshape(B, S, C)
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, silu=silu,
                          n_chunks=n_chunks, chunk=chunk),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, C), bias.reshape(1, C))
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
