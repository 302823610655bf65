"""Chip calibration: true streaming bandwidth + MXU rate at conv-GEMM shapes.

Decides whether an implicit-GEMM Pallas conv can beat XLA's conv kernels:
if a plain XLA matmul at the conv's (M, K=C, N=C) geometry already runs at
XLA-conv speed (~82 TFLOP/s at C=320), the MXU geometry is the cap and a
custom kernel buys nothing; if the matmul runs near the flash kernel's
measured 177 TFLOP/s, the conv lowering itself is the gap.

All measurements chain dependent ops inside ONE program (tunnel-safe).
Writes artifacts/RATE_PROBE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

INNER = int(os.environ.get("ED_PROBE_INNER", "16"))
REPS = int(os.environ.get("ED_PROBE_REPS", "3"))


def run(prog, *args):
    out = prog(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    times = []
    for _ in range(REPS):
        t0 = time.time()
        out = prog(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        times.append(time.time() - t0)
    return min(times) / INNER


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    r = {}

    # 1. streaming bandwidth: y = x * c, bf16, 0.21 GB tensor
    x = jax.random.normal(jax.random.PRNGKey(0), (20, 128, 128, 320),
                          jnp.bfloat16)

    @jax.jit
    def stream(x):
        for _ in range(INNER):
            x = x * jnp.bfloat16(1.0001)
        return x

    t = run(stream, x)
    gb = 2 * x.size * 2 / 1e9
    r["stream_bf16"] = {"ms": round(t * 1e3, 3), "gbps": round(gb / t, 0)}
    print("stream", r["stream_bf16"], flush=True)

    # 1b. fp32 variant
    x32 = x.astype(jnp.float32)

    @jax.jit
    def stream32(x):
        for _ in range(INNER):
            x = x * jnp.float32(1.0001)
        return x

    t = run(stream32, x32)
    gb = 2 * x32.size * 4 / 1e9
    r["stream_f32"] = {"ms": round(t * 1e3, 3), "gbps": round(gb / t, 0)}
    print("stream32", r["stream_f32"], flush=True)

    # 2. matmul rates at conv-GEMM geometries (alternating W1/W2 to chain)
    for label, M, K, N in [
        ("gemm_M327680_K320_N320", 327680, 320, 320),
        ("gemm_M81920_K640_N640", 81920, 640, 640),
        ("gemm_M32768_K2880_N320", 32768, 2880, 320),
        ("gemm_M8192_K1280_N1280", 8192, 1280, 1280),
    ]:
        a = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        w1 = jax.random.normal(jax.random.PRNGKey(2), (K, N),
                               jnp.bfloat16) * 0.02
        w2 = jax.random.normal(jax.random.PRNGKey(3), (N, K),
                               jnp.bfloat16) * 0.02

        @jax.jit
        def gemm(a, w1, w2):
            for _ in range(INNER // 2):
                b = jnp.dot(a, w1)
                a = jnp.dot(b, w2)
            return a

        # run() divides by INNER; the loop issues INNER dots total, so t2 is
        # seconds per single dot (the two chained geometries are symmetric)
        t2 = run(gemm, a, w1, w2)
        fl = 2 * M * K * N
        r[label] = {"ms_per_dot": round(t2 * 1e3, 3),
                    "tflops": round(fl / t2 / 1e12, 1)}
        print(label, r[label], flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/RATE_PROBE.json", "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
