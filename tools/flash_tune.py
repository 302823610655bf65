"""Sweep flash-attention block sizes at the production shapes on the chip.

The kernel defaults (block_q=256, block_k=512) were chosen analytically;
this sweeps the grid around them at the exact (B*H, S, D) shapes the SDXL /
SD1.x UNets and the VAE mid-attention run, and prints the fastest config
per shape. Feed the winners back into kernels/flash_attention.py defaults
(or a per-shape table) if they beat the defaults by >5%.

Run: python tools/flash_tune.py          (needs the TPU backend)
Env: ED_TUNE_REPS=5
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# (label, batch_rows B*H, seq, head_dim) — production shapes:
#   SDXL view batch 20: down_1/up_1 (S=4096, H=10), down_2/mid/up_2 (S=1024,
#   H=20); SD1.x: D=40/80/160 at S=4096/1024/256; VAE mid at 2048^2 decode:
#   S=65536 single head D=512.
SHAPES = [
    ("xl_s4096_d64_b200", 200, 4096, 64),
    ("xl_s1024_d64_b400", 400, 1024, 64),
    ("sd15_s4096_d40_b160", 160, 4096, 40),
    ("vae_mid_s65536_d512_b1", 1, 65536, 512),
]

BLOCKS_Q = tuple(int(x) for x in os.environ.get(
    "ED_TUNE_BQ", "128,256,512").split(","))
BLOCKS_K = tuple(int(x) for x in os.environ.get(
    "ED_TUNE_BK", "256,512,1024").split(","))


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from elasticdiffusion_tpu.kernels.flash_attention import flash_attention

    reps = int(os.environ.get("ED_TUNE_REPS", "5"))
    only = os.environ.get("ED_TUNE_SHAPES")
    shapes = [sh for sh in SHAPES if only is None or sh[0] in only.split(",")]
    results = {}
    for label, bh, s, d in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (1, s, bh, d),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (1, s, bh, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (1, s, bh, d),
                              jnp.bfloat16)
        flops = 4 * bh * s * s * d
        # The tunnel's host->device->host sync roundtrip (~ms) would swamp a
        # single sub-ms kernel, so each timing chains `inner` data-dependent
        # kernel calls (out feeds the next q) behind ONE 1-element fetch and
        # divides; the single remaining roundtrip is subtracted.
        inner = max(1, int(os.environ.get("ED_TUNE_INNER", "8")))
        float(q[0, 0, 0, 0])
        t0 = time.time()
        for _ in range(4):
            float(q[0, 0, 0, 0])
        roundtrip = (time.time() - t0) / 4
        best = None
        for bq, bk in itertools.product(BLOCKS_Q, BLOCKS_K):
            if bq > s or bk > s:
                continue
            try:
                out = flash_attention(q, k, v, block_q=bq, block_k=bk)
                float(out[0, 0, 0, 0])  # sync (tunnel-safe)
                times = []
                for _ in range(reps):
                    t0 = time.time()
                    out = q
                    for _ in range(inner):
                        out = flash_attention(out, k, v, block_q=bq,
                                              block_k=bk)
                    float(out[0, 0, 0, 0])
                    times.append((time.time() - t0) / inner)
                t = max(min(times) - roundtrip / inner, 1e-9)
                tf = flops / t / 1e12
                print(f"{label} bq={bq} bk={bk}: {t*1e3:7.2f} ms "
                      f"{tf:6.1f} TFLOP/s", flush=True)
                if best is None or t < best[0]:
                    best = (t, bq, bk, tf)
            except Exception as e:
                print(f"{label} bq={bq} bk={bk}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        if best:
            results[label] = {"seconds": round(best[0], 5), "block_q": best[1],
                              "block_k": best[2],
                              "tflops_per_sec": round(best[3], 1)}
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/FLASH_TUNE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
