"""Microbenchmark the resnet-stage building blocks on the chip.

PERF_ANALYSIS.md: after the flash retune, the shallow resnet-heavy chain
stages sit at 2.5-2.8x their roofline floor while the transformer stages sit
at ~1.9x — so the remaining kernel target is the 3x3 conv + GroupNorm path
at 128^2/64^2. This probe times, at the exact production shapes:

  1. the 3x3 conv alone, three formulations:
     - XLA conv_general_dilated (what nn.Conv emits),
     - 9-shift matmul sum (sum_{dy,dx} shift(x) @ W[dy,dx]),
     - im2col patches -> one big matmul;
  2. fused GroupNorm+SiLU: Pallas two-kernel vs plain-XLA manual formula;
  3. the full resnet sandwich (GN+SiLU -> conv -> GN+SiLU -> conv -> add)
     with each GN path, to see what XLA fusion recovers.

Timing is tunnel-safe: `inner` data-dependent iterations behind one
1-element fetch. Writes artifacts/CONV_PROBE.json.

Run: python tools/conv_probe.py          (needs the TPU backend)
Env: ED_PROBE_REPS=3 ED_PROBE_INNER=8 ED_PROBE_SHAPES=...
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (label, B, H, W, C) — SDXL merged-batch resnet shapes (batch 20) plus the
# SD1.x 64^2 equivalent.
SHAPES = [
    ("xl_b20_128sq_c320", 20, 128, 128, 320),
    ("xl_b20_64sq_c640", 20, 64, 64, 640),
    ("xl_b6_128sq_c320", 6, 128, 128, 320),
]

REPS = int(os.environ.get("ED_PROBE_REPS", "3"))
INNER = int(os.environ.get("ED_PROBE_INNER", "8"))


def timed(fn, *args, label=""):
    """Median-of-reps per-call seconds; INNER chained calls per rep."""
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).reshape(-1)[0])  # real sync on the tunnel
    times = []
    for _ in range(REPS):
        t0 = time.time()
        o = args[0]
        rest = args[1:]
        for _ in range(INNER):
            o = fn(o, *rest)
        float(jnp.asarray(o).reshape(-1)[0])
        times.append((time.time() - t0) / INNER)
    t = min(times)
    print(f"  {label}: {t * 1e3:8.3f} ms", flush=True)
    return t


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.kernels.groupnorm import fused_group_norm

    only = os.environ.get("ED_PROBE_SHAPES")
    shapes = [s for s in SHAPES if only is None or s[0] in only.split(",")]
    results = {}
    for label, B, H, W, C in shapes:
        print(f"{label}:", flush=True)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C),
                              jnp.bfloat16) * 0.02
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)
        conv_flops = 2 * 9 * C * C * H * W * B

        @jax.jit
        def conv_xla(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_shift(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    part = jnp.einsum(
                        "bhwc,cd->bhwd",
                        jax.lax.dynamic_slice(
                            xp, (0, dy, dx, 0), (B, H, W, C)),
                        w[dy, dx],
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            return acc.astype(x.dtype)

        @jax.jit
        def conv_im2col(x, w):
            patches = jax.lax.conv_general_dilated_patches(
                x, (3, 3), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # patches: (B, H, W, C*9) with feature order (C, ky, kx)
            wmat = w.transpose(2, 0, 1, 3).reshape(9 * C, C)
            return jnp.einsum("bhwk,kd->bhwd", patches, wmat,
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)

        @jax.jit
        def gn_pallas(x, scale, bias):
            return fused_group_norm(x, scale, bias, 32, silu=True)

        @jax.jit
        def gn_xla(x, scale, bias):
            x32 = x.astype(jnp.float32)
            xg = x32.reshape(B, -1, 32, C // 32)
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.mean(xg * xg, axis=(1, 3), keepdims=True) - mean * mean
            out = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
            out = out.reshape(x32.shape) * scale + bias
            return (out * jax.nn.sigmoid(out)).astype(x.dtype)

        def make_resnet(gn):
            @jax.jit
            def resnet(x, w1, w2, scale, bias):
                h = gn(x, scale, bias).astype(x.dtype)
                h = jax.lax.conv_general_dilated(
                    h, w1, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = gn(h, scale, bias).astype(x.dtype)
                h = jax.lax.conv_general_dilated(
                    h, w2, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return x + h
            return resnet

        w2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, C, C),
                               jnp.bfloat16) * 0.02
        r = {}
        t = timed(conv_xla, x, w, label="conv 3x3 XLA")
        r["conv_xla_ms"] = round(t * 1e3, 3)
        r["conv_xla_tflops"] = round(conv_flops / t / 1e12, 1)
        t = timed(conv_shift, x, w, label="conv 3x3 9-shift")
        r["conv_shift_ms"] = round(t * 1e3, 3)
        r["conv_shift_tflops"] = round(conv_flops / t / 1e12, 1)
        t = timed(conv_im2col, x, w, label="conv 3x3 im2col")
        r["conv_im2col_ms"] = round(t * 1e3, 3)
        r["conv_im2col_tflops"] = round(conv_flops / t / 1e12, 1)
        hbm_gb = 2 * B * H * W * C * 2 / 1e9  # bf16 read+write
        t = timed(gn_pallas, x, scale, bias, label="GN+SiLU pallas")
        r["gn_pallas_ms"] = round(t * 1e3, 3)
        r["gn_pallas_gbps"] = round(hbm_gb / t, 0)
        t = timed(gn_xla, x, scale, bias, label="GN+SiLU XLA")
        r["gn_xla_ms"] = round(t * 1e3, 3)
        r["gn_xla_gbps"] = round(hbm_gb / t, 0)
        res_p = make_resnet(lambda a, s, b: fused_group_norm(
            a, s, b, 32, silu=True))
        res_x = make_resnet(
            lambda a, s, b: gn_xla.__wrapped__(a, s, b))
        t = timed(res_p, x, w, w2, scale, bias, label="resnet pallas-GN")
        r["resnet_pallas_ms"] = round(t * 1e3, 3)
        t = timed(res_x, x, w, w2, scale, bias, label="resnet XLA-GN")
        r["resnet_xla_ms"] = round(t * 1e3, 3)
        r["resnet_floor_ms"] = round(2 * conv_flops / 197e12 * 1e3, 3)
        results[label] = r

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/CONV_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
