"""Load the REAL reference ElasticDiffusion class for oracle use.

VERDICT r1 item 5: the round-1 parity tests compared against *transcriptions*
of the reference's tensor math (tests/oracles.py) — a shared misreading would
pass. torch (cpu) is installed, and the reference's geometry/resample methods
are pure tensor methods, so we can import `/root/reference/elastic_diffusion.py`
directly (stubbing the absent diffusers/torchvision/cv2 modules, which the
pure methods never touch), instantiate the class WITHOUT loading any models
via `object.__new__`, and call the genuine code as the oracle.

Methods usable this way (all pure given a few instance attributes):
  get_views                      /root/reference/elastic_diffusion.py:197-229
  crop_with_context              :706-757
  random_downsample              :522-558
  random_nearest_downsample      :560-630
  random_sample_exclude_mask     :501-520
  restore_mask_shape             :446-465
  to_even_rational               :468-476
  get_keep_blocks                :478-499
  nearest_interpolate            :868-883
  fill_in_from_downsampled_direction  :633-647
  get_downsample_size            :943-950

This module is a test fixture; nothing here ships in the package.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

# transformers otherwise imports tensorflow (~36 s on this 1-core host)
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_TORCH", "1")

REF_DIR = "/root/reference"


def _ensure_stub(name, **attrs):
    if name in sys.modules:
        mod = sys.modules[name]
    else:
        mod = types.ModuleType(name)
        mod.__stub__ = True
        # a real ModuleSpec so importlib.util.find_spec on the stub name
        # (e.g. transformers probing cv2) doesn't raise
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        if not hasattr(mod, k):
            setattr(mod, k, v)
    return mod


class _StubClass:
    """Placeholder for model classes the pure methods never construct."""

    def __init__(self, *a, **k):  # pragma: no cover
        raise RuntimeError("stub model class must not be instantiated in tests")


def _install_stubs():
    import torch  # real torch 2.13+cpu is installed

    diffusers = _ensure_stub(
        "diffusers",
        AutoencoderKL=_StubClass, UNet2DConditionModel=_StubClass,
        DDIMScheduler=_StubClass, ControlNetModel=_StubClass)
    models = _ensure_stub("diffusers.models", ControlNetModel=_StubClass)
    _ensure_stub(
        "diffusers.models.attention_processor",
        AttnProcessor2_0=_StubClass, LoRAAttnProcessor2_0=_StubClass,
        LoRAXFormersAttnProcessor=_StubClass, XFormersAttnProcessor=_StubClass)
    _ensure_stub("diffusers.image_processor", VaeImageProcessor=_StubClass)
    diffusers.models = models

    tv = _ensure_stub("torchvision")
    transforms = _ensure_stub("torchvision.transforms", ToPILImage=_StubClass)
    utils = _ensure_stub("torchvision.utils", make_grid=lambda *a, **k: None)
    tv.transforms, tv.utils = transforms, utils

    if "cv2" not in sys.modules:
        _ensure_stub("cv2", Canny=None)


def load_reference_module(filename="elastic_diffusion.py",
                          module_name="ref_elastic_diffusion"):
    """Import a reference source file as a module (cached in sys.modules)."""
    if module_name in sys.modules:
        return sys.modules[module_name]
    _install_stubs()
    spec = importlib.util.spec_from_file_location(
        module_name, f"{REF_DIR}/{filename}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


def make_ref(vae_scale_factor=8, verbose=False, controlnet=False,
             sd_version="2.0"):
    """Instantiate the genuine ElasticDiffusion class without model loading.

    `object.__new__` skips both nn.Module.__init__ and the ctor's
    from_pretrained calls; the pure tensor methods only read the attributes
    set here (plain-value setattr works on an uninitialized nn.Module).
    """
    if controlnet:
        mod = load_reference_module("elastic_diffusion_w_controlnet.py",
                                    "ref_elastic_diffusion_w_controlnet")
    else:
        mod = load_reference_module()
    ref = object.__new__(mod.ElasticDiffusion)
    object.__setattr__(ref, "vae_scale_factor", vae_scale_factor)
    object.__setattr__(ref, "verbose", verbose)
    object.__setattr__(ref, "device", "cpu")
    object.__setattr__(ref, "sd_version", sd_version)
    object.__setattr__(ref, "random_downasmple_pre", {})  # sic (reference spelling)
    return ref
