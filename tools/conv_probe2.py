"""In-program op-rate probe: chain N dependent ops inside ONE jitted program.

conv_probe.py's chained-dispatch timing carries a ~4 ms fixed cost per
dispatch through the tunnel (its GN time is nearly flat from batch 6 to 20),
which swamps sub-10 ms ops. Here each measurement is a single program that
applies the op `inner` times in a dependent chain (lax unrolled), so the
only dispatch cost is one program launch + one 1-element fetch — the true
in-program rate XLA achieves inside the segmented UNet chain.

Writes artifacts/CONV_PROBE2.json.
Run: python tools/conv_probe2.py        (needs the TPU backend)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

INNER = int(os.environ.get("ED_PROBE_INNER", "12"))
REPS = int(os.environ.get("ED_PROBE_REPS", "3"))


def bench_program(make_fn, x, *consts, label=""):
    """make_fn(x, *consts) -> same-shape x; chained INNER times in one jit."""

    @jax.jit
    def prog(x, *consts):
        for _ in range(INNER):
            x = make_fn(x, *consts)
        return x

    out = prog(x, *consts)
    float(jnp.asarray(out).reshape(-1)[0])
    times = []
    for _ in range(REPS):
        t0 = time.time()
        out = prog(x, *consts)
        float(jnp.asarray(out).reshape(-1)[0])
        times.append(time.time() - t0)
    t = min(times) / INNER
    print(f"  {label}: {t * 1e3:8.3f} ms/op", flush=True)
    return t


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.kernels.groupnorm import fused_group_norm

    results = {}
    shapes = [("b20_128sq_c320", 20, 128, 128, 320),
              ("b20_64sq_c640", 20, 64, 64, 640),
              ("b6_128sq_c320", 6, 128, 128, 320)]
    only = os.environ.get("ED_PROBE_SHAPES")
    for label, B, H, W, C in shapes:
        if only and label not in only.split(","):
            continue
        print(f"{label}:", flush=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                              jnp.bfloat16)
        w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C),
                               jnp.bfloat16) * 0.02
        w2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, C, C),
                               jnp.bfloat16) * 0.02
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)
        conv_flops = 2 * 9 * C * C * H * W * B

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def gn_xla(x, scale, bias):
            x32 = x.astype(jnp.float32)
            xg = x32.reshape(B, -1, 32, C // 32)
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.mean(xg * xg, axis=(1, 3), keepdims=True) - mean * mean
            out = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
            out = out.reshape(x32.shape) * scale + bias
            return (out * jax.nn.sigmoid(out)).astype(x.dtype)

        def gn_pal(x, scale, bias):
            return fused_group_norm(x, scale, bias, 32, silu=True)

        def resnet(gn):
            def f(x, w1, w2, scale, bias):
                h = gn(x, scale, bias).astype(x.dtype)
                h = conv(h, w1)
                h = gn(h, scale, bias).astype(x.dtype)
                h = conv(h, w2)
                return x + h
            return f

        r = {}
        t = bench_program(conv, x, w1, label="conv3x3")
        r["conv_ms"] = round(t * 1e3, 3)
        r["conv_tflops"] = round(conv_flops / t / 1e12, 1)
        t = bench_program(gn_xla, x, scale, bias, label="gn_xla")
        r["gn_xla_ms"] = round(t * 1e3, 3)
        t = bench_program(gn_pal, x, scale, bias, label="gn_pallas")
        r["gn_pallas_ms"] = round(t * 1e3, 3)
        t = bench_program(resnet(gn_xla), x, w1, w2, scale, bias,
                          label="resnet_xla_gn")
        r["resnet_xla_ms"] = round(t * 1e3, 3)
        t = bench_program(resnet(gn_pal), x, w1, w2, scale, bias,
                          label="resnet_pallas_gn")
        r["resnet_pallas_ms"] = round(t * 1e3, 3)
        r["conv_floor_ms"] = round(conv_flops / 197e12 * 1e3, 3)
        results[label] = r

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/CONV_PROBE2.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
