"""Cold-compile + runtime A/B of RuntimeConfig.scan_depth on the real chip.

Measures, for scan_depth in (off, on), at the production SDXL merged-chain
config (segment_merge_core=full_core, batch 20 = the 1024x2048 step's
2*(rs+1)+V merged estimate batch):

  1. cold compile wall-clock of the full segmented chain (first call) — the
     "first ever generation" stall VERDICT r3 weak #2 flagged (354 s). The
     persistent compilation cache is deliberately NOT enabled in the arms,
     so every arm's first call is a true cold compile;
  2. steady-state per-forward seconds (best of reps) — guards against the
     scan trading compile time for runtime.

Each arm runs in a subprocess so backend/caches can't leak across arms.
Writes artifacts/SCAN_COMPILE_AB.json.

Run: python tools/scan_compile_ab.py            (needs the TPU backend)
Env: ED_AB_BATCH=20  ED_AB_REPS=3
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(scan: str) -> None:
    """Subprocess body: one arm, fresh cache dir, prints one JSON line."""
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.models.registry import load_bundle

    bs = int(os.environ.get("ED_AB_BATCH", "20"))
    reps = int(os.environ.get("ED_AB_REPS", "3"))
    runtime = RuntimeConfig(param_dtype=jnp.bfloat16,
                            compute_dtype=jnp.bfloat16, use_pallas="auto",
                            segment_merge_core="full_core", scan_depth=scan)
    b = load_bundle("XL1.0", runtime=runtime)
    s = b.sample_size
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (bs, b.in_channels, s, s), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (bs, 77, b.config.unet.cross_attention_dim),
                            jnp.bfloat16)
    kw = dict(added_text_embeds=jnp.zeros((bs, b.config.unet.pooled_projection_dim)),
              added_time_ids=jnp.zeros((bs, 6)))
    t0 = time.time()
    out = b.apply_unet_segmented(x, jnp.float32(500.0), ctx, **kw)
    jax.device_get(out.reshape(-1)[0])
    compile_s = time.time() - t0
    best = None
    for _ in range(reps):
        t0 = time.time()
        out = b.apply_unet_segmented(x, jnp.float32(500.0), ctx, **kw)
        jax.device_get(out.reshape(-1)[0])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"scan_depth": scan, "batch": bs,
                      "cold_compile_seconds": round(compile_s, 1),
                      "total_seconds": round(best, 4),
                      "per_forward_seconds": round(best / bs, 4)}))


def main():
    out = {}
    for scan in ("on", "off"):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", scan],
            capture_output=True, text=True)
        if p.returncode != 0:
            out[scan] = {"failed": True, "stderr": p.stderr[-2000:]}
            print(f"arm {scan} FAILED:\n{p.stderr[-2000:]}", flush=True)
            continue
        line = p.stdout.strip().splitlines()[-1]
        out[scan] = json.loads(line)
        out[scan]["arm_wall_seconds"] = round(time.time() - t0, 1)
        print(line, flush=True)
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/SCAN_COMPILE_AB.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": True}))


if __name__ == "__main__":
    if "--arm" in sys.argv:
        run_arm(sys.argv[sys.argv.index("--arm") + 1])
    else:
        main()
