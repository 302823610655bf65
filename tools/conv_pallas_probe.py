"""A/B the Pallas implicit-GEMM conv3x3 against XLA's conv at the UNet
resnet shapes, in-program chained (same methodology as conv_probe2.py so
the numbers are directly comparable with artifacts/CONV_PROBE2.json).

Writes artifacts/CONV_PALLAS_PROBE.json.
Run: python tools/conv_pallas_probe.py        (needs the TPU backend)
"""

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
    from elasticdiffusion_tpu.kernels.conv3x3 import conv3x3, _plan

    results = {}
    shapes = [("b20_128sq_c320", 20, 128, 128, 320),
              ("b20_64sq_c640", 20, 64, 64, 640),
              ("b20_32sq_c1280", 20, 32, 32, 1280),
              ("b6_128sq_c320", 6, 128, 128, 320),
              ("b6_64sq_c640", 6, 64, 64, 640),
              ("b6_32sq_c1280", 6, 32, 32, 1280)]
    only = os.environ.get("ED_PROBE_SHAPES")
    for label, B, H, W, C in shapes:
        if only and label not in only.split(","):
            continue
        print(f"{label}: plan={_plan(H, W, C, C, 2)}", flush=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C),
                              jnp.bfloat16) * 0.02
        bias = jnp.zeros((C,), jnp.float32)
        conv_flops = 2 * 9 * C * C * H * W * B

        def conv_xla(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv_pal(x, w, bias):
            return conv3x3(x, w, bias)

        # one-off correctness on chip
        ref = jnp.asarray(conv_xla(x, w), jnp.float32)
        got = jnp.asarray(conv_pal(x, w, bias), jnp.float32)
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"  max abs err vs XLA: {err:.4g} (max |ref| {scale:.4g})",
              flush=True)

        r = {"err_vs_xla": round(err, 5)}
        t = bench_program(conv_xla, x, w, label="conv_xla")
        r["conv_xla_ms"] = round(t * 1e3, 3)
        r["conv_xla_tflops"] = round(conv_flops / t / 1e12, 1)
        t = bench_program(conv_pal, x, w, bias, label="conv_pallas")
        r["conv_pallas_ms"] = round(t * 1e3, 3)
        r["conv_pallas_tflops"] = round(conv_flops / t / 1e12, 1)
        r["conv_floor_ms"] = round(conv_flops / 197e12 * 1e3, 3)
        results[label] = r

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/CONV_PALLAS_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
