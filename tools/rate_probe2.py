"""Slope-calibrated chip rates: stream, GEMM, conv3x3, GroupNorm.

rate_probe.py showed every chained dot costing ~2 ms regardless of FLOPs —
a fixed per-program cost (launch + 1-element fetch through the tunnel,
~30 ms) divided by the chain length. Here each op is timed at two chain
lengths inside one program each, and the rate comes from the SLOPE
(t_long - t_short) / (n_long - n_short), which cancels any fixed cost.

Writes artifacts/RATE_PROBE2.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_SHORT = int(os.environ.get("ED_PROBE_SHORT", "4"))
N_LONG = int(os.environ.get("ED_PROBE_LONG", "36"))
REPS = int(os.environ.get("ED_PROBE_REPS", "3"))


def slope_time(make_chain):
    """make_chain(n) -> jitted program with n chained ops. Returns s/op."""
    ts = {}
    for n in (N_SHORT, N_LONG):
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
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT), ts[N_SHORT]


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.kernels.groupnorm import fused_group_norm
    r = {}

    # streaming bandwidth
    for lab, dt in (("stream_bf16", jnp.bfloat16), ("stream_f32", jnp.float32)):
        x = jax.random.normal(jax.random.PRNGKey(0), (20, 128, 128, 320), dt)

        def mk(n, x=x, dt=dt):
            @jax.jit
            def prog(x):
                for _ in range(n):
                    x = x * dt(1.0001)
                return x
            return prog, (x,)

        t, fixed = slope_time(mk)
        gb = 2 * x.size * x.dtype.itemsize / 1e9
        r[lab] = {"ms": round(t * 1e3, 3), "gbps": round(gb / t, 0),
                  "fixed_ms": round(fixed * 1e3, 1)}
        print(lab, r[lab], flush=True)

    # GEMM rates at conv geometries
    for label, M, K, N in [
        ("gemm_M327680_K320_N320", 327680, 320, 320),
        ("gemm_M81920_K640_N640", 81920, 640, 640),
        ("gemm_M20480_K1280_N1280", 20480, 1280, 1280),
    ]:
        a0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        w1 = jax.random.normal(jax.random.PRNGKey(2), (K, N),
                               jnp.bfloat16) * 0.02
        w2 = jax.random.normal(jax.random.PRNGKey(3), (N, K),
                               jnp.bfloat16) * 0.02

        def mk(n, a0=a0, w1=w1, w2=w2):
            @jax.jit
            def prog(a, w1, w2):
                for _ in range(n // 2):
                    b = jnp.dot(a, w1)
                    a = jnp.dot(b, w2)
                return a
            return prog, (a0, w1, w2)

        t, fixed = slope_time(mk)
        r[label] = {"ms_per_dot": round(t * 1e3, 3),
                    "tflops": round(2 * M * K * N / t / 1e12, 1),
                    "fixed_ms": round(fixed * 1e3, 1)}
        print(label, r[label], flush=True)

    # conv3x3 + GN at the production resnet shape
    for lab, B, H, W, C in [("conv_b20_128sq_c320", 20, 128, 128, 320),
                            ("conv_b20_64sq_c640", 20, 64, 64, 640)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C),
                              jnp.bfloat16) * 0.02

        def mk(n, x=x, w=w):
            @jax.jit
            def prog(x, w):
                for _ in range(n):
                    x = jax.lax.conv_general_dilated(
                        x, w, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return x
            return prog, (x, w)

        t, fixed = slope_time(mk)
        fl = 2 * 9 * C * C * H * W * B
        r[lab] = {"ms": round(t * 1e3, 3), "tflops": round(fl / t / 1e12, 1),
                  "fixed_ms": round(fixed * 1e3, 1)}
        print(lab, r[lab], flush=True)

    for lab, pallas in (("gn_xla_b20_128sq_c320", False),
                        ("gn_pallas_b20_128sq_c320", True)):
        B, H, W, C = 20, 128, 128, 320
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                              jnp.bfloat16)
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)

        def gn(x, scale, bias, pallas=pallas, B=B, C=C):
            if pallas:
                return fused_group_norm(x, scale, bias, 32, silu=True)
            x32 = x.astype(jnp.float32)
            xg = x32.reshape(B, -1, 32, C // 32)
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.mean(xg * xg, axis=(1, 3), keepdims=True) - mean * mean
            out = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
            out = out.reshape(x32.shape) * scale + bias
            return (out * jax.nn.sigmoid(out)).astype(x.dtype)

        def mk(n, x=x):
            @jax.jit
            def prog(x, scale, bias):
                for _ in range(n):
                    x = gn(x, scale, bias)
                return x
            return prog, (x, scale, bias)

        t, fixed = slope_time(mk)
        gb = 2 * x.size * 2 / 1e9
        r[lab] = {"ms": round(t * 1e3, 3), "gbps_rw": round(gb / t, 0),
                  "fixed_ms": round(fixed * 1e3, 1)}
        print(lab, r[lab], flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/RATE_PROBE2.json", "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
