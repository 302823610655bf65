"""elasticdiffusion_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of ElasticDiffusion.

ElasticDiffusion (CVPR 2024) is a training-free decoding method that lets a
pretrained latent text-to-image diffusion model generate images at arbitrary
sizes (up to 2x the training resolution) by decomposing the denoising update
into a global (classifier-free-guidance direction, estimated at native
resolution on a resampled downsampled latent) and a local (unconditional
score over overlapping patch views with sparse context) signal, plus optional
reduced-resolution guidance.

Reference behavior: /root/reference/elastic_diffusion.py (see SURVEY.md).
This package is a ground-up TPU-first re-design: Flax model stack, static
index plans, a fully jittable denoise step, sharded patch views over a
`jax.sharding.Mesh`, and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

from elasticdiffusion_tpu.configs import (  # noqa: F401
    SDVersion,
    ModelBundleConfig,
    UNetConfig,
    VAEConfig,
    CLIPTextConfig,
    get_bundle_config,
)
from elasticdiffusion_tpu.sched.weight_schedulers import (  # noqa: F401
    CosineScheduler,
    LinearScheduler,
    ConstScheduler,
)


def __getattr__(name):
    """Lazy top-level export of the pipeline class (PEP 562) so
    `from elasticdiffusion_tpu import ElasticDiffusion` mirrors the
    reference's one-import ergonomics (`from elastic_diffusion import
    ElasticDiffusion`) without eagerly importing the model stack."""
    if name == "ElasticDiffusion":
        from elasticdiffusion_tpu.core.pipeline import ElasticDiffusion
        return ElasticDiffusion
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
