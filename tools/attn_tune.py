"""On-chip A/B of the one-shot attention kernel vs the streaming flash path.

Round-4 block_probe showed UNet self-attention VPU-bound: flash at the core
shape (BH=400, S=1024, D=64) ran at 22 TFLOP/s while the surrounding GEMMs
sat at/near peak. The one-shot kernel (kernels/flash_attention.py) removes
the online-softmax rescale passes; this tool measures both paths (and the
MXU-denominator variant, and a bq sweep) at the production shapes with the
slope method (two chain lengths cancel the ~30 ms tunnel dispatch cost).

Writes artifacts/ATTN_TUNE.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = int(os.environ.get("ED_PROBE_REPS", "3"))

# (label, BH, S, D): SDXL core (down_2/mid/up_2), SDXL down_1/up_1,
# SD1.x mid-level shapes.
SHAPES = [
    ("sdxl_core_bh400_s1024_d64", 400, 1024, 64),
    ("sdxl_updown1_bh200_s4096_d64", 200, 4096, 64),
    ("sd1x_bh160_s4096_d40", 160, 4096, 40),
]


def slope_time(prog, args, n_short, n_long):
    ts = {}
    for n in (n_short, n_long):
        p = prog(n)
        out = p(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        best = None
        for _ in range(REPS):
            t0 = time.time()
            out = p(*args)
            float(jnp.asarray(out).reshape(-1)[0])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        ts[n] = best
    return (ts[n_long] - ts[n_short]) / (n_long - n_short)


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.kernels import flash_attention as fa

    r = {}
    key = jax.random.PRNGKey(0)
    for label, BH, S, D in SHAPES:
        H = 4  # fold BH into (B, H) for the public API; split keeps B sane
        B = BH // H
        q = (jax.random.normal(key, (B, S, H, D), jnp.float32)
             * 0.5).astype(jnp.bfloat16)
        flops = 4 * BH * S * S * D
        entry = {}

        def mk_public(n, oneshot):
            @jax.jit
            def prog(q):
                x = q
                for _ in range(n):
                    x = fa.flash_attention(x, x, x, oneshot=oneshot)
                    x = x * jnp.asarray(0.5, x.dtype) + q * jnp.asarray(
                        0.01, x.dtype)
                return x
            return prog

        for name, oneshot in (("stream", "off"), ("oneshot", "on")):
            t = slope_time(functools.partial(mk_public, oneshot=oneshot),
                           (q,), 1, 5 if S >= 4096 else 9)
            entry[name] = {"ms": round(t * 1e3, 3),
                           "tflops": round(flops / t / 1e12, 1)}
            print(label, name, entry[name], flush=True)

        # variants on the internal entry point: mxu_sum and bq sweep
        qf = q.transpose(0, 2, 1, 3).reshape(BH, S, D)
        scale = 1.0 / (D ** 0.5)

        def mk_var(n, mxu_sum):
            run = jax.jit(functools.partial(
                fa._oneshot_attention, scale=scale, mxu_sum=mxu_sum,
                interpret=False))

            @jax.jit
            def prog(x):
                y = x
                for _ in range(n):
                    y = run(y, y, y)
                    y = y * jnp.asarray(0.5, y.dtype) + x * jnp.asarray(
                        0.01, y.dtype)
                return y
            return prog

        for name, ms in (("oneshot_vpu_sum", False), ("oneshot_mxu_sum", True)):
            t = slope_time(functools.partial(mk_var, mxu_sum=ms),
                           (qf,), 1, 5 if S >= 4096 else 9)
            entry[name] = {"ms": round(t * 1e3, 3),
                           "tflops": round(flops / t / 1e12, 1)}
            print(label, name, entry[name], flush=True)

        r[label] = entry
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/ATTN_TUNE.json", "w") as f:
            json.dump(r, f, indent=1)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
