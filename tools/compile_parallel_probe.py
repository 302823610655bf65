"""Does the remote XLA compile service parallelize concurrent compiles?

Cold-start matters (VERDICT r3 weak #2): the segmented chain's programs are
known before the first call, so IF the compile service runs concurrent
compiles in parallel, AOT-warming them from threads turns sum-of-compiles
into max-of-compiles. This probe compiles the SAME front-stage program at
four different batch sizes (distinct cache keys, near-identical compile
cost): two serially, then two concurrently from threads.

Writes artifacts/COMPILE_PARALLEL_PROBE.json.
Run: python tools/compile_parallel_probe.py      (needs the TPU backend)
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() not in ("cpu",), "needs the TPU backend"
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.models.registry import load_bundle
    runtime = RuntimeConfig(param_dtype=jnp.bfloat16,
                            compute_dtype=jnp.bfloat16, use_pallas="auto",
                            segment_merge_core="full_core")
    b = load_bundle("XL1.0", runtime=runtime)
    s = b.sample_size

    def lowered(bs):
        def front(params, x, t, ctx, pooled, tids):
            return b.unet.apply({"params": params}, stage="front_1",
                                sample_nchw=x, timesteps=t,
                                encoder_hidden_states=ctx,
                                added_text_embeds=pooled,
                                added_time_ids=tids)
        x = jax.ShapeDtypeStruct((bs, b.in_channels, s, s), jnp.bfloat16)
        ctx = jax.ShapeDtypeStruct(
            (bs, 77, b.config.unet.cross_attention_dim), jnp.bfloat16)
        pooled = jax.ShapeDtypeStruct(
            (bs, b.config.unet.pooled_projection_dim), jnp.float32)
        tids = jax.ShapeDtypeStruct((bs, 6), jnp.float32)
        return jax.jit(front).lower(
            jax.eval_shape(lambda p: p, b.unet_params), x,
            jax.ShapeDtypeStruct((), jnp.float32), ctx, pooled, tids)

    out = {}
    t0 = time.time()
    for bs in (18, 22):
        ls = lowered(bs)
        t1 = time.time()
        ls.compile()
        out[f"serial_b{bs}_compile_s"] = round(time.time() - t1, 1)
    out["serial_total_s"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)

    t0 = time.time()
    lows = [lowered(bs) for bs in (26, 30)]
    with ThreadPoolExecutor(2) as ex:
        list(ex.map(lambda l: l.compile(), lows))
    out["parallel_total_s"] = round(time.time() - t0, 1)
    out["speedup"] = round(out["serial_total_s"] / out["parallel_total_s"], 2)
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/COMPILE_PARALLEL_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
