"""Slope-calibrated per-component timing of the SDXL hot blocks on chip.

Round-3 left the deep transformer stages (core_1) at 1.76x the compute
floor and the conv stages (front_1/tail_1) at 2.4-2.8x (VERDICT r3 weak
#3, artifacts/SEGMENT_PROFILE.json). This probe decomposes ONE depth-10
transformer block and ONE resnet at their production shapes into
components, each timed by the rate_probe2 slope method (two chain lengths
inside one program; the difference cancels the ~30 ms fixed per-program
cost of the tunnel backend), plus A/B variants of the candidate fixes:

  - fused QKV projection (one GEMM instead of 3) in self-attention
  - bf16 LayerNorm (no fp32 cast round-trip) [measurement only]
  - XLA vs flash attention at S=1024 (the core stage's sequence)

Shapes: core transformer B=20, S=1024 (32^2), C=1280, 20 heads x D=64,
ctx 77x2048; front/tail resnet B=20, 128^2, C=320.

Writes artifacts/BLOCK_PROBE.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_SHORT = int(os.environ.get("ED_PROBE_SHORT", "2"))
N_LONG = int(os.environ.get("ED_PROBE_LONG", "10"))
REPS = int(os.environ.get("ED_PROBE_REPS", "3"))

B, S, C = 20, 1024, 1280
HEADS, D = 20, 64
CTX_S, CTX_C = 77, 2048
FF_INNER = 4 * C


def slope_time(make_chain, n_short=None, n_long=None):
    ts = {}
    n_short = N_SHORT if n_short is None else n_short
    n_long = N_LONG if n_long is None else n_long
    for n in (n_short, n_long):
        prog, args = make_chain(n)
        out = prog(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        best = None
        for _ in range(REPS):
            t0 = time.time()
            out = prog(*args)
            float(jnp.asarray(out).reshape(-1)[0])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        ts[n] = best
    return (ts[n_long] - ts[n_short]) / (n_long - n_short), ts[n_short]


def record(r, label, t, flops=None, gb=None, fixed=None):
    e = {"ms": round(t * 1e3, 3)}
    if flops:
        e["tflops"] = round(flops / t / 1e12, 1)
    if gb:
        e["gbps"] = round(gb / t, 0)
    if fixed is not None:
        e["fixed_ms"] = round(fixed * 1e3, 1)
    r[label] = e
    print(label, e, flush=True)
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/BLOCK_PROBE.json", "w") as f:
        json.dump(r, f, indent=1)


def chain(body, *args0):
    """make_chain factory: x evolves through body; 0.5x damping keeps bf16
    activations bounded over the chain (fuses into the epilogue, ~free)."""
    def mk(n):
        @jax.jit
        def prog(x, *rest):
            for _ in range(n):
                x = body(x, *rest) * jnp.asarray(0.5, x.dtype)
            return x
        return prog, args0
    return mk


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import flax.linen as nn
    from elasticdiffusion_tpu.models.layers import (
        BasicTransformerBlock, GEGLUFeedForward, ResnetBlock2D,
    )
    from elasticdiffusion_tpu.kernels.flash_attention import flash_attention

    r = {}
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    x = (jax.random.normal(key, (B, S, C), jnp.float32) * 0.5).astype(bf)
    ctx = jax.random.normal(jax.random.fold_in(key, 1),
                            (B, CTX_S, CTX_C), jnp.float32).astype(bf)

    # ---- the full block as the model composes it --------------------------
    btb = BasicTransformerBlock(HEADS, D, dtype=bf, use_pallas="auto")
    p_btb = btb.init(key, x, ctx)

    gemm_flops = 2 * B * S * C * C
    attn_flops = 4 * B * HEADS * S * S * D
    ff_flops = 2 * B * S * C * (2 * FF_INNER) + 2 * B * S * FF_INNER * C
    cross_flops = (2 * gemm_flops                      # q, out
                   + 2 * 2 * B * CTX_S * CTX_C * C     # k, v from ctx
                   + 4 * B * HEADS * S * CTX_S * D)
    block_flops = 4 * gemm_flops + attn_flops + cross_flops + ff_flops

    # ---- components -------------------------------------------------------
    # LayerNorm with the model's fp32 cast round-trip
    ln = nn.LayerNorm(dtype=jnp.float32)
    p_ln = ln.init(key, x.astype(jnp.float32))
    t, fx = slope_time(chain(
        lambda x: ln.apply(p_ln, x.astype(jnp.float32)).astype(x.dtype), x),
        2, 34)
    record(r, "ln_fp32_roundtrip", t, gb=2 * x.size * 2 / 1e9, fixed=fx)

    # LayerNorm natively in bf16 (params fp32) — numerics candidate only
    ln_b = nn.LayerNorm(dtype=bf)
    p_lnb = ln_b.init(key, x)
    t, fx = slope_time(chain(lambda x: ln_b.apply(p_lnb, x), x), 2, 34)
    record(r, "ln_bf16", t, gb=2 * x.size * 2 / 1e9, fixed=fx)

    # self-attn projections: 3 separate Dense (as the model does)
    w_q = (jax.random.normal(key, (C, C), jnp.float32) * 0.02).astype(bf)
    w_k = (jax.random.normal(key, (C, C), jnp.float32) * 0.02).astype(bf)
    w_v = (jax.random.normal(key, (C, C), jnp.float32) * 0.02).astype(bf)
    w_qkv = jnp.concatenate([w_q, w_k, w_v], axis=1)  # (C, 3C)

    def proj3(x, wq, wk, wv):
        q = x @ wq
        k = x @ wk
        v = x @ wv
        return q * k + v  # multiplicative: cannot fold into one GEMM
    t, fx = slope_time(chain(proj3, x, w_q, w_k, w_v), 2, 18)
    record(r, "qkv_3dense", t, flops=3 * gemm_flops, fixed=fx)

    def proj1(x, w):
        qkv = x @ w
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return q * k + v
    t, fx = slope_time(chain(proj1, x, w_qkv), 2, 18)
    record(r, "qkv_fused", t, flops=3 * gemm_flops, fixed=fx)

    # attention core at S=1024: flash vs XLA
    q4 = x.reshape(B, S, HEADS, D)
    t, fx = slope_time(chain(
        lambda q: flash_attention(q, q4, q4).reshape(B, S, C).reshape(
            B, S, HEADS, D), q4))
    record(r, "attn_flash_s1024", t, flops=attn_flops, fixed=fx)

    def xla_attn(q):
        from elasticdiffusion_tpu.kernels.attention import reference_attention
        return reference_attention(q, q4, q4)
    t, fx = slope_time(chain(xla_attn, q4))
    record(r, "attn_xla_s1024", t, flops=attn_flops, fixed=fx)

    # GEGLU FF
    ff = GEGLUFeedForward(C, dtype=bf)
    p_ff = ff.init(key, x)
    t, fx = slope_time(chain(lambda x: ff.apply(p_ff, x), x))
    record(r, "ff_geglu", t, flops=ff_flops, fixed=fx)

    # ---- resnet at the front/tail production shape ------------------------
    for lab, (rb_B, rb_H, rb_C) in (("resnet_b20_128sq_c320", (20, 128, 320)),
                                    ("resnet_b20_32sq_c1280", (20, 32, 1280))):
        rx = (jax.random.normal(key, (rb_B, rb_H, rb_H, rb_C),
                                jnp.float32) * 0.5).astype(bf)
        temb = jax.random.normal(key, (rb_B, 4 * 320), jnp.float32).astype(bf)
        res = ResnetBlock2D(rb_C, dtype=bf, use_pallas="auto")
        p_res = res.init(key, rx, temb)
        conv_fl = 2 * 9 * rb_C * rb_C * rb_H * rb_H * rb_B
        t, fx = slope_time(chain(lambda x, e: res.apply(p_res, x, e),
                                 rx, temb))
        record(r, lab, t, flops=2 * conv_fl, fixed=fx)

        # same conv pair without norms: isolates GN+SiLU+temb overhead
        w1 = (jax.random.normal(key, (3, 3, rb_C, rb_C), jnp.float32)
              * 0.02).astype(bf)

        def two_convs(x, w):
            for _ in range(2):
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return x
        t, fx = slope_time(chain(two_convs, rx, w1))
        record(r, lab + "_convs_only", t, flops=2 * conv_fl, fixed=fx)

    # ---- the full block as the model composes it (most expensive compile,
    # so it goes last; every component above is already on disk by now) ----
    t, fx = slope_time(chain(lambda x, ctx: btb.apply(p_btb, x, ctx), x, ctx))
    record(r, "block_full", t, flops=block_flops, fixed=fx)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/BLOCK_PROBE.json", "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
