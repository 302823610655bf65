"""Minimal repro for the production-context Mosaic 'Bad lhs type' failure.

kernels/flash_attention.py's bf16 NN kernel compiles standalone
(tools/flash_bf16_probe.py) but fails when the pallas_call sits inside the
production transformer program (bench r3 try1). This drives the SAME call
context — q/k/v produced by linear projections of a (B, S, C) activation,
all inside one jit — and tries candidate fixes one by one.

Usage: python tools/flash_prod_repro.py [variant...]
variants: prod, barrier, copy, plain
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from elasticdiffusion_tpu.kernels.flash_attention import (
    _flash_kernel_bf16_nn, flash_attention,
)

import os

B = int(os.environ.get("RB", "24"))
S = int(os.environ.get("RS", "1024"))
HEADS = int(os.environ.get("RH", "20"))
D = int(os.environ.get("RD", "64"))
C = HEADS * D


def _attn_with(k_transform):
    def run(x, wq, wk, wv):
        q = (x @ wq).reshape(B, S, HEADS, D)
        k = (x @ wk).reshape(B, S, HEADS, D)
        v = (x @ wv).reshape(B, S, HEADS, D)
        scale = 1.0 / (D ** 0.5)
        qf = q.transpose(0, 2, 1, 3).reshape(B * HEADS, S, D)
        kf = k.transpose(0, 2, 1, 3).reshape(B * HEADS, S, D)
        vf = v.transpose(0, 2, 1, 3).reshape(B * HEADS, S, D)
        kin = k_transform(kf)
        bq, bk = 256, 512
        out = pl.pallas_call(
            functools.partial(_flash_kernel_bf16_nn, scale=scale),
            grid=(B * HEADS, S // bq, S // bk),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, bk), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * HEADS, S, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        )(qf, kin, vf)
        return out.reshape(B, HEADS, S, D).transpose(0, 2, 1, 3).reshape(B, S, C)
    return run


def prod(x, wq, wk, wv):
    """Exactly the production entry (kernels/flash_attention.flash_attention)."""
    q = (x @ wq).reshape(B, S, HEADS, D)
    k = (x @ wk).reshape(B, S, HEADS, D)
    v = (x @ wv).reshape(B, S, HEADS, D)
    return flash_attention(q, k, v).reshape(B, S, C)


VARIANTS = {
    "prod": prod,
    "barrier": _attn_with(
        lambda kf: jax.lax.optimization_barrier(kf.transpose(0, 2, 1))),
    "copy": _attn_with(
        lambda kf: kf.transpose(0, 2, 1) * jnp.bfloat16(1.0) + jnp.bfloat16(0.0)),
    "plain": _attn_with(lambda kf: kf.transpose(0, 2, 1)),
}


def main():
    assert jax.default_backend() != "cpu"
    import os as _os
    if _os.environ.get("ED_REPRO_CACHE", "1") == "1":
        # the ACTUAL production delta: enable_compilation_cache sets the
        # global jax_default_matmul_precision='highest', which poisons bf16
        # pallas dots with contract_precision<fp32> (root cause of the
        # 'Bad lhs type' Mosaic failures r2/r3)
        from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    names = sys.argv[1:] or list(VARIANTS)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, C), jnp.bfloat16)
    ws = [jax.random.normal(jax.random.fold_in(key, i), (C, C),
                            jnp.bfloat16) * 0.02 for i in range(3)]
    for name in names:
        fn = jax.jit(VARIANTS[name])
        t0 = time.time()
        try:
            o = fn(x, *ws)
            float(o[0, 0, 0])
            print(f"[{name}] OK compile+run {time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            print(f"[{name}] FAIL {time.time()-t0:.1f}s: {msg}", flush=True)


if __name__ == "__main__":
    main()
