"""Probe HBM occupancy of the XL bundle + 2048x2048 decode paths.

The flagship e2e (2048x2048 rs=10 tiled) OOMs in decode even at 256 halo
bands, while decode-only at the same size ran in 6.9 s (seam_compare) —
i.e. the OOM is about what else is resident, not the decode working set.
This tool loads the full XL bundle (UNet + 2 text encoders + VAE, bf16 HBM
weights + fp32 VAE masters), prints allocator stats, then tries monolithic
and banded stage-B decode at latent 256x256.

Env: ED_PROBE_H/W (pixel, default 2048), ED_PROBE_BANDS (default 0=mono).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def stats(tag):
    s = jax.local_devices()[0].memory_stats() or {}
    gb = 1024 ** 3
    print(f"[mem] {tag}: in_use={s.get('bytes_in_use', 0)/gb:.2f}GB "
          f"peak={s.get('peak_bytes_in_use', 0)/gb:.2f}GB "
          f"limit={s.get('bytes_limit', 0)/gb:.2f}GB", flush=True)


def main():
    from elasticdiffusion_tpu.configs import RuntimeConfig
    from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
    from elasticdiffusion_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    H = int(os.environ.get("ED_PROBE_H", "2048"))
    W = int(os.environ.get("ED_PROBE_W", "2048"))
    bands = int(os.environ.get("ED_PROBE_BANDS", "0"))

    stats("startup")
    runtime = RuntimeConfig(param_dtype=jnp.bfloat16,
                            compute_dtype=jnp.bfloat16, use_pallas="auto")
    pipe = ElasticDiffusion(sd_version="XL1.0", runtime=runtime)
    stats("bundle loaded")

    lat = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4, H // 8, W // 8), np.float32))
    from elasticdiffusion_tpu.parallel.halo_decode import halo_decode
    streamed = os.environ.get("ED_PROBE_STREAMED") == "1"
    kw = dict(streamed=True) if streamed else dict(num_bands=bands or None)
    tag = "streamed" if streamed else f"bands={bands or None}"
    t0 = time.time()
    img = halo_decode(pipe.bundle, lat, **kw)
    jax.device_get(jnp.ravel(img)[0])
    print(f"[decode] {tag} cold={time.time()-t0:.1f}s", flush=True)
    stats(f"after decode {tag}")
    t0 = time.time()
    img = halo_decode(pipe.bundle, lat, **kw)
    jax.device_get(jnp.ravel(img)[0])
    print(f"[decode] {tag} warm={time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
