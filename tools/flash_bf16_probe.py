"""Probe: bf16-dot flash-attention formulations at the production hot shapes.

r2 attempt at full-rate bf16 MXU dots inside kernels/flash_attention.py hit a
Mosaic layout failure ('Bad lhs type' on the tiled NT matmul) and was
reverted (commit ad53e0d). VERDICT r3 #3 asks for a re-attack via different
formulations. This probe times, on the real chip, at the SDXL segment-profile
hot shapes (depth-10 transformer stages dominate: seq 1024 h20 d64 and seq
4096 h10 d64, plus the SD1.5 16k outlier):

  a) current kernel (fp32 in-VMEM upcast dots)
  b) bf16-dot variant of the same kernel (NT dot, bf16 operands)
  c) bf16-dot with K PRE-TRANSPOSED in HBM (kernel NN dot)
  d) jax.experimental.pallas.ops.tpu.flash_attention (reference TPU kernel)
  e) plain XLA attention (jnp einsum chain) as the baseline

Usage: python tools/flash_bf16_probe.py  (expects the axon TPU backend)
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from elasticdiffusion_tpu.kernels.flash_attention import flash_attention


# ---------------------------------------------------------------- variants

def _kernel_bf16(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                 scale: float):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                    # (bq, d) bf16
    k = k_ref[0]                                    # (bk, d) bf16
    v = v_ref[0]                                    # (bk, d) bf16
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[:] = m_new
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _kernel_bf16_nn(q_ref, kt_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                    scale: float):
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
                            preferred_element_type=jnp.float32) * scale
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[:] = m_new
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _run_variant(kernel, q, k, v, bq=256, bk=512, pre_t=False):
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Sq, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Sk, D)
    bq = min(bq, Sq)
    while Sq % bq:
        bq //= 2
    bk = min(bk, Sk)
    while Sk % bk:
        bk //= 2
    grid = (B * H, Sq // bq, Sk // bk)
    if pre_t:
        kin = kf.transpose(0, 2, 1)  # (BH, D, Sk) in HBM
        kspec = pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM)
    else:
        kin = kf
        kspec = pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
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
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=B * H * Sq * Sk),
    )(qf, kin, vf).reshape(B, H, Sq, D).transpose(0, 2, 1, 3)


bf16_nt = jax.jit(lambda q, k, v: _run_variant(_kernel_bf16, q, k, v))
bf16_nn = jax.jit(lambda q, k, v: _run_variant(_kernel_bf16_nn, q, k, v,
                                               pre_t=True))
cur = jax.jit(flash_attention)


@jax.jit
def xla_attn(q, k, v):
    D = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / (D ** 0.5)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def jax_ops_flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as fa,
    )
    # expects (B, H, S, D)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = fa(qt, kt, vt, causal=False, sm_scale=1.0 / (q.shape[-1] ** 0.5))
    return o.transpose(0, 2, 1, 3)


jax_ops_flash_jit = jax.jit(jax_ops_flash)


def sync(a):
    return float(jnp.asarray(a).reshape(-1)[0])


def time_fn(fn, q, k, v, reps=5):
    try:
        o = fn(q, k, v)
        sync(o)
    except Exception as e:
        return None, f"{type(e).__name__}: {str(e)[:200]}"
    # roundtrip estimate
    t0 = time.time()
    for _ in range(3):
        sync(o)
    rt = (time.time() - t0) / 3
    times = []
    for _ in range(reps):
        t0 = time.time()
        o = fn(q, k, v)
        sync(o)
        times.append(time.time() - t0 - rt)
    return min(times), None


def main():
    assert jax.default_backend() != "cpu", "probe needs the TPU backend"
    shapes = [
        ("sdxl_mid_d10", (16, 1024, 20, 64)),
        ("sdxl_down1", (16, 4096, 10, 64)),
        ("sd15_down0", (8, 4096, 8, 40)),
    ]
    results = {}
    for name, (B, S, H, D) in shapes:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(kq, 1), (B, S, H, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(kq, 2), (B, S, H, D),
                              jnp.bfloat16)
        row = {}
        ref = None
        for label, fn in (("fp32_cur", cur), ("bf16_nt", bf16_nt),
                          ("bf16_nn", bf16_nn),
                          ("jax_ops", jax_ops_flash_jit)):
            t, err = time_fn(fn, q, k, v)
            if err:
                row[label] = {"error": err}
                print(f"[{name}] {label}: ERROR {err}", file=sys.stderr)
                continue
            o = fn(q, k, v)
            if ref is None:
                ref = jnp.asarray(o, jnp.float32)
                maxerr = 0.0
            else:
                maxerr = float(jnp.max(jnp.abs(jnp.asarray(o, jnp.float32)
                                               - ref)))
            flops = 4 * B * H * S * S * D
            row[label] = {"ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 2),
                          "maxerr_vs_fp32cur": round(maxerr, 4)}
            print(f"[{name}] {label}: {row[label]}", file=sys.stderr)
        results[name] = row
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
