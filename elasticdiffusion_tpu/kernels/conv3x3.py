"""Implicit-GEMM 3x3 SAME conv Pallas kernel (stride 1, NHWC).

XLA's conv at the UNet resnet shapes (128sq C=320, 64sq C=640) runs at
~82-96 TFLOP/s (artifacts/CONV_PROBE2.json) -- ~2.4x above its compute
floor, well below the ~136 TFLOP/s practical ceiling once the C=320
lane-padding to 384 is priced in. This kernel reaches for that ceiling by
keeping the whole tap reduction in VMEM.

Grid (B, H/bh, O/obk), o innermost. Each (b, i) superstep stages one
halo'd row tile (bh+2, W+2, C) in VMEM scratch and runs the 3x3 taps as
9 accumulating MXU dots

    acc(bh, W, obk) += tile[dy:dy+bh, dx:dx+W, :] . w[dy, dx]

with fp32 accumulation; dy indexes whole (sublane, lane) tiles (free),
dx is a sublane shift (VPU copy). SAME-padding column edges are
zero-filled once in VMEM (no HBM pre-pad of the 200MB activation).

The two halo rows per tile arrive as a separate (B, nI, 2, W, C) operand
built by one strided slice outside the kernel (2/bh extra HBM read, ~6%
at bh=32) -- Mosaic cannot DMA-slice a tiled HBM memref whose lane dim is
not 128-aligned (C=320 pads to 384), so a manual halo'd copy of x itself
is not expressible; routing both operands through the normal BlockSpec
pipeline sidesteps that and keeps the HBM->VMEM streaming double-buffered
for free. Weights/bias stream the same way ((3,3,C,obk) blocks,
revisited when obk==O).

MEASURED OUTCOME (artifacts/CONV_PALLAS_PROBE.json, v5e): parity to
slightly worse than XLA's conv — 77.3 vs 85.8 TFLOP/s at B=20 128sq
C=320, 105.3 vs 101.8 at 64sq C=640 (the one win, +3.5%), 103.9 vs
103.9 at 32sq C=1280. The dx sublane-shift relayouts plus the halo
re-read eat the lane-padding margin the kernel was built to recover.
Kept as an opt-in (models/layers.py Conv3x3, ED_CONV_IMPL=pallas) and a
recorded negative result; the production default remains
lax.conv_general_dilated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def _plan(H: int, W: int, C: int, O: int, itemsize: int):
    """Pick (bh, obk) fitting the VMEM budget; None if no legal plan.

    obk must be O itself or a multiple of 128 dividing O (Mosaic last-dim
    block rule); bh must divide H. Larger bh amortizes the halo overlap
    and the per-block weight revisit; larger obk cuts tap re-reads.
    """
    obks = [O] + [ob for ob in (512, 384, 256, 128)
                  if ob < O and O % ob == 0]
    for obk in obks:
        for bh in (32, 16, 8, 4):
            if H % bh:
                continue
            xblk = 2 * bh * W * C * itemsize            # pipelined x2
            halo = 2 * 2 * W * C * itemsize
            tile = (bh + 2) * (W + 2) * C * itemsize    # scratch
            # the 3 hoisted dx-shifted views are materialized VPU
            # relayout copies of the whole tile (minus edge columns)
            shifted = 3 * (bh + 2) * W * C * itemsize
            wblk = 2 * 9 * C * obk * itemsize
            acc = bh * W * obk * 4
            outb = 2 * bh * W * obk * itemsize
            if (xblk + halo + tile + shifted + wblk + acc + outb
                    <= _VMEM_BUDGET):
                return bh, obk
    return None


def _kernel(x_ref, halo_ref, w_ref, b_ref, y_ref, tile, *,
            bh: int, W: int, silu_out: bool):
    o = pl.program_id(2)
    C = x_ref.shape[4]

    @pl.when(o == 0)
    def _stage():
        # SAME-padding column edges: never written below, so zeroing once
        # per kernel launch would do -- but the store is 2 sublanes, cheap.
        tile[:, 0, :] = jnp.zeros((bh + 2, C), tile.dtype)
        tile[:, W + 1, :] = jnp.zeros((bh + 2, C), tile.dtype)
        tile[0, pl.ds(1, W), :] = halo_ref[0, 0, 0]
        tile[pl.ds(1, bh), pl.ds(1, W), :] = x_ref[0, 0]
        tile[bh + 1, pl.ds(1, W), :] = halo_ref[0, 0, 1]

    obk = y_ref.shape[3]
    # dx shifts hoisted out of the tap loop: a sublane-offset slice is a
    # VPU relayout copy, so take the 3 shifted views of the whole tile
    # once (3 copies) instead of per-tap (9). dy then indexes the
    # untiled leading dim -- free.
    shifted = [tile[:, dx:dx + W, :] for dx in range(3)]
    # 2D matmuls: Mosaic's matmul rejects the batched 3D dot_general form
    # ("Bad lhs type"); the (bh, W, C) -> (bh*W, C) reshape stacks whole
    # (sublane, lane) tiles, which is layout-free.
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = shifted[dx][dy:dy + bh].reshape(bh * W, C)
            # precision pinned to DEFAULT: an ambient
            # default_matmul_precision('highest'/'high') scope would stamp
            # contract_precision<fp32> onto these bf16 operands, which
            # Mosaic rejects (same failure class as the r3 decode bug —
            # see kernels/flash_attention.py).
            d = jnp.dot(xs, w_ref[dy, dx],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            acc = d if acc is None else acc + d
    acc = acc + b_ref[0]
    if silu_out:
        acc = acc * jax.nn.sigmoid(acc)
    y_ref[0] = acc.reshape(bh, W, obk).astype(y_ref.dtype)


def conv3x3_plan_exists(shape, O: int, itemsize: int = 2) -> bool:
    """Whether conv3x3 has a legal VMEM plan for this shape at the dtype
    the caller will actually pass (itemsize = post-cast dtype itemsize —
    conv3x3 re-plans with x.dtype.itemsize, so the gate must match or an
    fp32 call could pass a bf16-only gate and hit the assert)."""
    B, H, W, C = shape
    # sublane/lane sanity: the (bh, W, C) -> (bh*W, C) reshape stacks
    # whole (8, 128)-tiles only when W is a sublane multiple.
    if W % 8 or C % 8 or O % 8:
        return False
    return _plan(H, W, C, O, itemsize) is not None


@functools.partial(jax.jit, static_argnames=("silu_out", "interpret"))
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None,
            silu_out: bool = False, interpret: bool = False) -> jnp.ndarray:
    """SAME stride-1 3x3 conv. x: (B,H,W,C) bf16/f32; w: (3,3,C,O).

    fp32 accumulation, output in x.dtype. Asserts a VMEM plan exists --
    callers gate on conv3x3_plan_exists and fall back to lax.conv.
    """
    B, H, W, C = x.shape
    kh, kw, Cw, O = w.shape
    assert (kh, kw, Cw) == (3, 3, C), (w.shape, x.shape)
    plan = _plan(H, W, C, O, x.dtype.itemsize)
    assert plan is not None, f"no VMEM plan for {x.shape}->{O}"
    bh, obk = plan
    nI, nO = H // bh, O // obk
    if bias is None:
        bias = jnp.zeros((O,), jnp.float32)
    bias2 = bias.astype(jnp.float32).reshape(1, O)

    # Halo rows per tile: top[i] = x[:, i*bh-1] (zeros at i=0),
    # bottom[i] = x[:, (i+1)*bh] (zeros at i=nI-1) -> (B, nI, 2, W, C).
    zrow = jnp.zeros((B, 1, W, C), x.dtype)
    if nI > 1:
        top = jnp.concatenate([zrow, x[:, bh - 1:H - 1:bh]], axis=1)
        bot = jnp.concatenate([x[:, bh:H:bh], zrow], axis=1)
    else:
        top, bot = zrow, zrow
    halo = jnp.stack([top, bot], axis=2)               # (B, nI, 2, W, C)
    x5 = x.reshape(B, nI, bh, W, C)

    kern = functools.partial(_kernel, bh=bh, W=W, silu_out=silu_out)
    flops = 2 * 9 * C * O * H * W * B
    return pl.pallas_call(
        kern,
        grid=(B, nI, nO),
        in_specs=[
            pl.BlockSpec((1, 1, bh, W, C), lambda b, i, o: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, W, C), lambda b, i, o: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, obk), lambda b, i, o: (0, 0, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, obk), lambda b, i, o: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, W, obk),
                               lambda b, i, o: (b, i, 0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, W + 2, C), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + halo.size) * x.dtype.itemsize
            + w.size * w.dtype.itemsize
            + B * H * W * O * x.dtype.itemsize,
            transcendentals=B * H * W * O if silu_out else 0),
        interpret=interpret,
    )(x5, halo, w, bias2)


def reference_conv3x3(x, w, bias=None, silu_out=False):
    """lax.conv reference for tests (fp32 accumulate like the kernel)."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if silu_out:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)
