"""Conv formulation A/B at the UNet resnet shapes (VERDICT r4 next #1b).

XLA's conv runs ~50% of bf16 peak at every production resnet shape
(CONV_PROBE2: 81.6 TF/s at B=20 128sq C=320, 95.6 at 64sq C=640), and the
round-4 Pallas implicit-GEMM kernel measured parity-to-worse. This probe
A/Bs every remaining reformulation that could beat the native conv emitter:

  conv        — lax.conv_general_dilated baseline (NHWC)
  shift9      — 3x3 conv as 9 shifted (HW,C)x(C,O) dots accumulated in one
                jit: turns the conv into plain MXU dots at dense-matmul
                rates, paying shifted reads XLA may or may not fuse
  im2col      — conv_general_dilated_patches -> one (BHW, 9C)x(9C, O) dot:
                contraction 9C kills the C=320 lane padding (2880 pads
                2.2%, not 17%) at the cost of 9x patch traffic
  csplit      — channel-split 320 -> 256+64 on the contraction (VERDICT's
                requested A/B; predicted flat: 2+1 lane tiles = the same 3
                tiles the padded 320 occupies)
  opad        — weights zero-padded on O to the 128-lane boundary, output
                sliced back: explicit vs implicit lane padding
  gn_xla_conv — jnp GroupNorm+SiLU -> conv in ONE jit (XLA input fusion)
                vs the production Pallas-GN -> conv sequence

Each variant is timed as a dependent chain inside one jitted program
(conv_probe2.py methodology: tunnel dispatch cost amortized away).
Writes artifacts/CONV_FORMULATION_AB.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INNER = int(os.environ.get("ED_PROBE_INNER", "10"))
REPS = int(os.environ.get("ED_PROBE_REPS", "3"))


def bench(fn, *args, label=""):
    @jax.jit
    def prog(x, *rest):
        for _ in range(INNER):
            x = fn(x, *rest)
        return x

    out = prog(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    times = []
    for _ in range(REPS):
        t0 = time.time()
        out = prog(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        times.append(time.time() - t0)
    t = min(times) / INNER
    print(f"  {label}: {t * 1e3:8.3f} ms/op", file=sys.stderr, flush=True)
    return t


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def shift9(x, w):
    B, H, W, C = x.shape
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, O), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            acc = acc + jnp.einsum("bhwc,co->bhwo", xs, w[dy, dx],
                                   preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def im2col(x, w):
    B, H, W, C = x.shape
    O = w.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches: (B, H, W, C*9) with channel-major taps (c, dy, dx)
    wr = jnp.transpose(w, (2, 0, 1, 3)).reshape(C * 9, O)
    y = jnp.einsum("bhwk,ko->bhwo", patches, wr,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def csplit(x, w, split=256):
    y1 = jax.lax.conv_general_dilated(
        x[..., :split], w[:, :, :split, :], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y2 = jax.lax.conv_general_dilated(
        x[..., split:], w[:, :, split:, :], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y1 + y2).astype(x.dtype)


def opad(x, w):
    O = w.shape[-1]
    Opad = -(-O // 128) * 128
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, Opad - O)))
    y = conv_ref(x, wp)
    return y[..., :O]


def gn_silu_jnp(x, groups=32, eps=1e-5):
    B, H, W, C = x.shape
    xg = x.reshape(B, H * W, groups, C // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(B, H, W, C)
    return (xn * jax.nn.sigmoid(xn)).astype(x.dtype)


def main():
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    assert jax.default_backend() not in ("cpu",), "probe needs TPU"

    shapes = [((20, 128, 128, 320), 320), ((20, 64, 64, 640), 640),
              ((6, 128, 128, 320), 320)]
    result = {}
    for (shape, O) in shapes:
        B, H, W, C = shape
        key = f"b{B}_{H}sq_c{C}"
        print(f"[ab] {key}", file=sys.stderr, flush=True)
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, O),
                               jnp.float32) * 0.02).astype(jnp.bfloat16)
        flops = 2 * 9 * C * O * H * W * B
        rec = {}
        # numerical sanity once per shape (bf16 tolerances)
        ref = np.asarray(conv_ref(x, w), np.float32)
        for name, fn in [("conv", conv_ref), ("shift9", shift9),
                         ("im2col", im2col), ("csplit", csplit),
                         ("opad", opad)]:
            got = np.asarray(fn(x, w), np.float32)
            dev = float(np.abs(got - ref).max())
            scale = float(np.abs(ref).max())
            assert dev < 0.12 * scale + 0.5, (name, dev, scale)
            t = bench(fn, x, w, label=f"{key}/{name}")
            rec[name] = {"ms": round(t * 1e3, 3),
                         "tflops": round(flops / t / 1e12, 1)}
        # GN+SiLU -> conv: XLA-fused jnp GN vs production Pallas GN
        from elasticdiffusion_tpu.kernels.groupnorm import fused_group_norm
        scale_p = jnp.ones((C,), jnp.float32)
        bias_p = jnp.zeros((C,), jnp.float32)

        def gn_xla_conv(x, w):
            return conv_ref(gn_silu_jnp(x), w)

        def gn_pallas_conv(x, w):
            h = fused_group_norm(x, scale_p, bias_p, groups=32, eps=1e-5,
                                 silu=True)
            return conv_ref(h.astype(x.dtype), w)

        for name, fn in [("gn_xla_conv", gn_xla_conv),
                         ("gn_pallas_conv", gn_pallas_conv)]:
            t = bench(fn, x, w, label=f"{key}/{name}")
            rec[name] = {"ms": round(t * 1e3, 3)}
        result[key] = rec
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/CONV_FORMULATION_AB.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
