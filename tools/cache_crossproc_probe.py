"""Does JAX's persistent compilation cache work ACROSS PROCESSES on the
remote (axon) XLA compile service? (VERDICT r4 weak #2: utils/cache.py has
no recorded evidence; the scan_depth='on' cache-priming story depends on it.)

Method: run the same jitted program (one production-shaped SDXL core stage
is too slow for a probe; use a mid-sized conv+matmul body that takes a few
seconds to compile remotely) in N fresh subprocesses sharing one cache dir,
recording compile wall-clock per process. A working cache shows process 2+
compiling ~instantly; a broken one shows flat times.

Writes artifacts/CACHE_CROSSPROC.json.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import json, os, sys, time
t_import = time.time()
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache(os.environ["PROBE_CACHE_DIR"])

# a compile-heavy body: chained convs + matmuls at half-production widths
def body(x, w1, w2, m):
    for _ in range(4):
        x = jax.lax.conv_general_dilated(
            x, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.silu(x)
        x = jax.lax.conv_general_dilated(
            x, w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = x.reshape(x.shape[0], -1, x.shape[-1])
    y = jnp.einsum("bsc,cd->bsd", y, m)
    return jax.nn.softmax(y, axis=-1) @ m.T

f = jax.jit(body)
k = jax.random.PRNGKey(0)
x = jax.random.normal(k, (4, 64, 64, 320), jnp.bfloat16)
w1 = jax.random.normal(k, (3, 3, 320, 320), jnp.bfloat16) * 0.02
w2 = jax.random.normal(k, (3, 3, 320, 320), jnp.bfloat16) * 0.02
m = jax.random.normal(k, (320, 320), jnp.bfloat16) * 0.02
t0 = time.time()
out = f(x, w1, w2, m)
float(out.reshape(-1)[0])
print(json.dumps({"compile_plus_run_s": round(time.time() - t0, 2),
                  "import_to_dispatch_s": round(t0 - t_import, 2)}))
"""


def main():
    cache_dir = os.environ.get("PROBE_CACHE_DIR") or tempfile.mkdtemp(
        prefix="ed_cache_probe_")
    runs = []
    n_runs = int(os.environ.get("PROBE_RUNS", "5"))
    for i in range(n_runs):
        env = dict(os.environ)
        env["PROBE_CACHE_DIR"] = cache_dir
        t0 = time.time()
        out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                             capture_output=True, text=True, timeout=1800)
        wall = time.time() - t0
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        rec = json.loads(line[-1]) if line else {"error": out.stderr[-500:]}
        rec["proc_wall_s"] = round(wall, 1)
        rec["run"] = i
        # entry-count growth after a warm run = a cache MISS on a program
        # this very probe already stored -> nondeterministic cache keys
        rec["cache_entries"] = (len(os.listdir(cache_dir))
                                if os.path.isdir(cache_dir) else 0)
        runs.append(rec)
        print(f"[probe] run {i}: {rec}", file=sys.stderr, flush=True)
    n_entries = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    result = {
        "cache_dir": cache_dir,
        "cache_entries_after": n_entries,
        "runs": runs,
        "backend_note": "each run is a FRESH python process; run 0 is the "
                        "cold compile, runs 1-2 hit (or miss) the persistent "
                        "cache on disk",
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/CACHE_CROSSPROC.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
