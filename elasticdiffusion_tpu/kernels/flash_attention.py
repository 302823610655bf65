"""Pallas TPU flash attention for the UNet self-attention hot path.

Shapes in this workload (SURVEY §5 'long-context'): every view is exactly
native resolution, so self-attention sequence lengths are 16384 / 4096 / 1024
tokens with head_dim 64/40/80/160. Online-softmax accumulation streams K/V
blocks through the innermost (sequential) grid dimension with VMEM scratch
carrying (m, l, acc) — no O(S^2) logits in HBM and no full-K/V VMEM residency
(full 16k-token K/V + pipelining overflows the 16 MB VMEM budget).

Cross-attention (k=77) and small sequences stay on the XLA path
(kernels/attention.py gates on sequence length).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on the v5e chip at the production shapes (tools/flash_tune.py,
# artifacts/FLASH_TUNE.json): 512/1024 beats the prior 256/512 at every
# measurable shape — S=4096 D=64 (SDXL down_1/up_1) 24.3 -> 12.9 ms,
# VAE mid S=65536 D=512 60.3 -> 49.2 ms; larger blocks fail to compile
# (VMEM) or sit below tunnel timing noise.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024

# Sk ceiling for the one-shot (whole-K/V-resident) kernel. At the UNet
# self-attention shapes (Sk = 1024/4096, block_probe round 4) attention is
# VPU-bound on softmax passes over the (bq, Sk) score matrix, not MXU-bound:
# the online-softmax running-max/denominator rescaling costs ~2x the minimum
# pass count. With Sk <= 4096 the full K/V rows fit VMEM (~1 MB at D=64
# bf16), so the one-shot kernel computes an exact softmax in the minimal
# number of VPU passes (max, exp, sum) with no scratch carry. VAE decode
# attention (Sk >= 16384) stays on the streaming kernel.
ONESHOT_MAX_SK = 4096


def oneshot_fits_vmem(sk: int, d: int, itemsize: int) -> bool:
    """The one-shot kernel keeps the FULL (padded) K and V rows resident in
    VMEM: 2*Skp*D*itemsize bytes before q/o blocks and score temporaries.
    Fine at every UNet shape (<= ~2.6 MB at D=160 bf16), but the VAE mid
    attention hits Sk=4096 at D=512 — fp32 there (background-stripe encodes
    at 512 px, core/background.py) is 16 MB of K/V alone, which overflows
    the 16 MB scoped-VMEM budget at compile time (measured 17.00M, round 5).
    Cap residency at half the budget; larger shapes take the streaming
    kernel, whose block clamp already handles fp32 D=512."""
    skp = -(-sk // 128) * 128
    return 2 * skp * d * itemsize <= (8 << 20)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # fp32 in-VMEM upcast before the dots. (The bf16-dot fast path lives in
    # _flash_kernel_bf16_nn below; this form is kept for fp32 inputs and for
    # head dims where the bf16 dots measured slower — see flash_attention.)
    # Precision is pinned to HIGHEST: unpinned dots inherit the AMBIENT
    # matmul-precision scope, and the VAE force_upcast decode wraps its
    # forward in default_matmul_precision('high') — a precision Mosaic
    # cannot lower ("Unsupported dot precision: HIGH"); this was the true
    # root cause of r3's silently-zero bench decode_seconds. HIGHEST on
    # fp32 operands is exactly what the previously-working global
    # 'highest' override stamped on these dots.
    q = q_ref[0].astype(jnp.float32) * scale        # (bq, d)
    k = k_ref[0].astype(jnp.float32)                # (bk, d)
    v = v_ref[0].astype(jnp.float32)                # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (bq, bk)
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[:] = m_new
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _flash_kernel_bf16_nn(q_ref, kt_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                          *, scale: float):
    """bf16-dot variant: full-rate MXU feeds with fp32 accumulation.

    r2's bf16 NT attempt hit a Mosaic 'Bad lhs type' failure (commit
    ad53e0d) that "compiled in isolation but failed in production" — ROOT
    CAUSE (r3): utils/cache.enable_compilation_cache sets the GLOBAL
    jax_default_matmul_precision='highest', which stamps
    contract_precision<fp32> onto the kernel's bf16 tpu.matmul — Mosaic
    rejects fp32-precision bf16 operands. Isolated probes never called
    enable_compilation_cache, so they always compiled. The dots below pin
    precision=DEFAULT explicitly, immunizing the kernel against the global
    override. The NN formulation (K pre-transposed to (d, Sk) in HBM)
    also measures fastest at the production head dims
    (tools/flash_bf16_probe.py). P is cast back to bf16 for the PV dot;
    softmax statistics stay fp32 in VMEM scratch.
    """
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                    # (bq, d)  bf16
    kt = kt_ref[0]                                  # (d, bk)  bf16
    v = v_ref[0]                                    # (bk, d)  bf16
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT) * scale
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[:] = m_new
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _oneshot_math(q, kt, v, out_dtype, *, sk_real: int, c: float,
                  mxu_sum: bool):
    """Shared one-shot exact-softmax body on VMEM-resident tiles.

    No online-softmax state: one max pass and ONE fused fma+exp2(+cast)
    pass over the (bq, Sk) scores. The 1/sqrt(D) logit scale and the
    exp->exp2 conversion fold into a single static constant c =
    scale*log2(e) applied as (s - m) * c — softmax is shift/scale-invariant
    in exactly this way, so no q pre-scale pass in HBM and no separate
    scale pass over the scores (each was a full extra pass in the previous
    kernel). The denominator is a fp32 VPU sum or an MXU dot of p against
    ones (mxu_sum; A/B'd on chip by tools/attn_tune.py). Dots pin
    precision=DEFAULT against the global 'highest' override (see
    _flash_kernel_bf16_nn's root-cause note).

    sk_real < the padded Sk block masks the zero-padded key columns (the
    cross-attention path: Sk=77 text tokens padded to one 128 lane — scores
    in VMEM, never the materialized (B,H,Sq,77) fp32 logits of the XLA
    fallback, which cost ~1 ms x 70 instances per SDXL merged forward).
    """
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)  # (bq, Sk)
    if sk_real != kt.shape[1]:
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < sk_real, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2((s - m) * c)                       # fp32 (bq, Sk)
    pb = p.astype(v.dtype)
    acc = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)  # (bq, d)
    if mxu_sum:
        ones = jnp.ones((v.shape[0], 1), v.dtype)
        l = jax.lax.dot_general(pb, ones, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
    else:
        l = jnp.sum(p, axis=-1, keepdims=True)
    return (acc / l).astype(out_dtype)


def _oneshot_kernel(q_ref, kt_ref, v_ref, o_ref, *, mxu_sum: bool,
                    sk_real: int, c: float):
    """Flattened (BH, S, D) layout: inputs arrive as HBM transpose copies."""
    o_ref[0] = _oneshot_math(q_ref[0], kt_ref[0], v_ref[0], o_ref.dtype,
                             sk_real=sk_real, c=c, mxu_sum=mxu_sum)


# NOTE (round 4): a (B, S, H, D)-direct block layout (no q/v/out transpose
# copies) was tried and is IMPOSSIBLE under current Mosaic constraints: a
# block's last two dims must be divisible by (8, 128) or equal the array
# dims, so a 1-of-H head slice with D=64 lanes is rejected; packed-lane
# alternatives all need 64-element lane slicing (not 128-aligned). The
# transpose copies stay; XLA fuses them into the surrounding projections.


def _oneshot_block_q(sq: int, sk: int) -> int:
    """Largest power-of-two q block keeping s(fp32)+p(bf16) under ~8 MB of
    the 16 MB VMEM (leaves room for K/V residency + q/o double-buffering)."""
    bq = 128
    while bq < sq and (2 * bq) * sk * 6 <= (8 << 20):
        bq *= 2
    bq = min(bq, sq)
    while sq % bq:
        bq //= 2
    return bq


_LOG2E = 1.4426950408889634


def _oneshot_attention(qf, kf, vf, scale, mxu_sum, interpret):
    BH, Sq, D = qf.shape
    Sk = kf.shape[1]
    skp = -(-Sk // 128) * 128                       # pad keys to whole lanes
    if skp != Sk:
        pad = ((0, 0), (0, skp - Sk), (0, 0))
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    bq = _oneshot_block_q(Sq, skp)
    ktf = kf.transpose(0, 2, 1)                     # (BH, D, Skp)
    grid = (BH, Sq // bq)
    return pl.pallas_call(
        functools.partial(_oneshot_kernel, mxu_sum=mxu_sum, sk_real=Sk,
                          c=scale * _LOG2E),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, skp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), qf.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Sq * skp * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=BH * Sq * skp),
        interpret=interpret,
    )(qf, ktf, vf)


def _oneshot_attention_4d(q, k, v, scale, interpret):
    """(B, Sq, H, D) in, (B, Sq, H, D) out — no q/v/out transpose copies."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    skp = -(-Sk // 128) * 128
    if skp != Sk:
        pad = ((0, 0), (0, skp - Sk), (0, 0), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    bq = _oneshot_block_q(Sq, skp)
    kt = k.transpose(0, 2, 3, 1)                    # (B, H, D, Skp)
    grid = (B, H, Sq // bq)
    return pl.pallas_call(
        functools.partial(_oneshot_kernel_4d, sk_real=Sk, c=scale * _LOG2E),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 1, D), lambda b, h, i: (b, i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, skp), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skp, 1, D), lambda b, h, i: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 1, D), lambda b, h, i: (b, i, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sq, H, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * skp * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq * skp),
        interpret=interpret,
    )(q, kt, v)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                              "interpret", "oneshot"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False,
                    oneshot: str = "auto") -> jnp.ndarray:
    """(B, Sq, H, D) x (B, Sk, H, D) -> (B, Sq, H, D), non-causal.

    Dispatch: Sk <= ONESHOT_MAX_SK (every UNet self-attention shape) takes
    the one-shot exact-softmax kernel — at those shapes attention is
    VPU-bound and the streaming rescale passes are pure overhead. Longer
    sequences (VAE decode attention): bf16 inputs with D >= 64 take the
    full-rate bf16-dot NN streaming kernel (K pre-transposed in HBM);
    everything else the fp32-upcast streaming kernel. D=40 (SD1.x) measured
    FASTER with fp32 dots — the narrow head underfills the MXU either way
    and the upcast is free against the lane padding
    (tools/flash_bf16_probe.py).
    """
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    scale = 1.0 / (D ** 0.5)

    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Sq, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)

    use_oneshot = (oneshot == "on"
                   or (oneshot == "auto" and Sk <= ONESHOT_MAX_SK
                       and oneshot_fits_vmem(Sk, D, q.dtype.itemsize)))
    if use_oneshot:
        out = _oneshot_attention(qf, kf, vf, scale, mxu_sum=False,
                                 interpret=interpret)
        return out.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)

    bq = min(block_q, Sq)
    while Sq % bq:
        bq //= 2
    bk = min(block_k, Sk)
    while Sk % bk:
        bk //= 2

    # VMEM-aware clamp: the tuned 512/1024 defaults assume bf16 D=64
    # (UNet). The VAE mid attention is fp32 D=512, where double-buffered
    # q/k/v blocks + the (bq, bk) score/prob temporaries at HIGHEST
    # precision blow the 16 MB scoped-VMEM budget (measured: 21.96M at
    # 1024x2048 decode). Halve the larger block until the working set
    # fits ~6 MB; the production bf16 shapes are untouched (4.8 MB).
    def _vmem_bytes(bq_, bk_):
        per_el = q.dtype.itemsize
        return (bq_ * D + 2 * bk_ * D + 2 * bq_ * bk_) * per_el * 2
    while _vmem_bytes(bq, bk) > (6 << 20) and max(bq, bk) > 128:
        if bk >= bq and bk > 128:
            bk //= 2
        else:
            bq //= 2

    use_bf16 = q.dtype == jnp.bfloat16 and D >= 64
    if use_bf16:
        kernel = _flash_kernel_bf16_nn
        kin = kf.transpose(0, 2, 1)              # (BH, D, Sk) in HBM
        kspec = pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM)
    else:
        kernel = _flash_kernel
        kin = kf
        kspec = pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM)

    grid = (B * H, Sq // bq, Sk // bk)
    out = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            kspec,
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running denom
            pltpu.VMEM((bq, D), jnp.float32),   # running numerator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=B * H * Sq * Sk),
        interpret=interpret,
    )(qf, kin, vf)
    return out.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)
