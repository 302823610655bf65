"""Condition preprocessors for the ControlNet path (SURVEY C21).

Reference (/root/reference/elastic_diffusion_w_controlnet.py:1102-1117):
  canny: cv2.Canny(img, 100, 200) -> 3-channel image
  depth: transformers depth-estimation pipeline (DPT)

canny is implemented natively (3x3 Sobel, L1 magnitude, 4-direction NMS,
double-threshold hysteresis — cv2.Canny's default algorithm) so the
framework has no OpenCV runtime dependency; where cv2 IS importable (it
is in this environment), tests/test_apps.py asserts bit-exactness against
the real cv2.Canny on randomized images. Depth runs through the native
Flax DPT
(models/dpt.py): converted Intel/dpt-large weights when ED_DPT_DIR points
at a checkpoint directory, random-init otherwise (plumbing mode — the
zero-egress environment has no pretrained weights). A caller-supplied
depth_fn still overrides both.
"""

from __future__ import annotations

import os
import warnings
from typing import Callable, Optional

import numpy as np

_builtin_depth_fn: Optional[Callable] = None


def default_depth_fn() -> Callable:
    """Lazily-built depth estimator: the Flax DPT (models/dpt.py) with
    converted weights from $ED_DPT_DIR (reference analog: transformers
    pipeline('depth-estimation'),
    /root/reference/elastic_diffusion_w_controlnet.py:183).

    Without a checkpoint this RAISES unless ED_DPT_ALLOW_RANDOM=1 opts into
    the random-init plumbing mode — a misconfigured checkpoint path must
    fail loudly, not silently feed structured noise into conditioning
    (ADVICE r2)."""
    global _builtin_depth_fn
    if _builtin_depth_fn is None:
        from elasticdiffusion_tpu.models.dpt import DPT_LARGE, make_depth_fn
        ckpt = os.environ.get("ED_DPT_DIR")
        params = None
        if ckpt:
            from elasticdiffusion_tpu.models.convert import (
                convert_dpt, load_state_dict,
            )
            params = convert_dpt(load_state_dict(ckpt), DPT_LARGE)
        elif os.environ.get("ED_DPT_ALLOW_RANDOM") == "1":
            warnings.warn(
                "ED_DPT_ALLOW_RANDOM=1: using a random-init depth estimator"
                " — depth maps will be structured noise (plumbing mode)")
        else:
            raise RuntimeError(
                "depth ControlNet needs DPT weights: set ED_DPT_DIR to a "
                "converted Intel/dpt-large checkpoint directory, or set "
                "ED_DPT_ALLOW_RANDOM=1 to opt into random-init plumbing mode")
        _builtin_depth_fn = make_depth_fn(params, DPT_LARGE)
    return _builtin_depth_fn


def _sobel3(img2d: np.ndarray):
    """3x3 Sobel with replicate border (cv2.Canny's Sobel call)."""
    p = np.pad(img2d, 1, mode="edge")
    gx = (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:]
          - p[:-2, :-2] - 2 * p[1:-1, :-2] - p[2:, :-2])
    gy = (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:]
          - p[:-2, :-2] - 2 * p[:-2, 1:-1] - p[:-2, 2:])
    return gx, gy


def canny(image: np.ndarray, low: float = 100.0, high: float = 200.0) -> np.ndarray:
    """cv2.Canny-exact edges (apertureSize=3, L2gradient=False defaults —
    the reference's call, /root/reference/elastic_diffusion_w_controlnet.py
    :1106). image: (H, W) or (H, W, C) uint8/float. Returns (H, W) uint8
    edge map {0, 255}.

    Semantics transcribed from OpenCV canny.cpp:
      - Sobel 3x3 with replicate border; L1 magnitude |gx| + |gy|
      - multi-channel input: per PIXEL, the channel with the largest
        magnitude supplies (gx, gy) — cv2 does NOT gray-convert
      - NMS sector split by |gy| vs |gx|*tan22.5 / *tan67.5, with cv2's
        asymmetric tie-breaks: horizontal 'm > left && m >= right',
        vertical 'm > up && m >= down', diagonals strict both sides —
        so a 2px-wide magnitude plateau yields a 1px edge, not 2px
      - magnitude map zero-padded at the NMS border (border pixels compare
        against 0, they are not excluded)
      - double threshold strict: strong m > high, candidate m > low;
        8-connected hysteresis from strong pixels
    Hand-derived goldens in tests/test_apps.py test_canny_cv2_goldens pin
    each of these behaviors."""
    img = np.asarray(image, dtype=np.float32)
    if img.ndim == 3:
        # cv2 multi-channel: per-pixel max-magnitude channel wins (strict >,
        # ties keep the lowest channel index)
        gxc = np.empty(img.shape, np.float32)
        gyc = np.empty(img.shape, np.float32)
        for c in range(img.shape[-1]):
            gxc[..., c], gyc[..., c] = _sobel3(img[..., c])
        magc = np.abs(gxc) + np.abs(gyc)
        pick = np.argmax(magc, axis=-1)
        gx = np.take_along_axis(gxc, pick[..., None], axis=-1)[..., 0]
        gy = np.take_along_axis(gyc, pick[..., None], axis=-1)[..., 0]
    else:
        gx, gy = _sobel3(img)
    H, W = gx.shape
    mag = np.abs(gx) + np.abs(gy)  # cv2 default L1

    # non-maximum suppression, cv2 sector rules + tie-breaks
    mp = np.pad(mag, 1)  # zero border, as cv2's map
    left, right = mp[1:-1, :-2], mp[1:-1, 2:]
    up, down = mp[:-2, 1:-1], mp[2:, 1:-1]
    ul, ur = mp[:-2, :-2], mp[:-2, 2:]
    dl, dr = mp[2:, :-2], mp[2:, 2:]
    ax, ay = np.abs(gx), np.abs(gy)
    TG22 = 0.4142135623730951           # tan(22.5 deg)
    horiz = ay < ax * TG22
    vert = ay > ax * (TG22 + 2.0)       # tan(67.5) = tan(22.5) + 2
    same_sign = (gx * gy) >= 0          # s = +1 in cv2's (xs ^ ys) test
    keep = np.where(
        horiz, (mag > left) & (mag >= right),
        np.where(vert, (mag > up) & (mag >= down),
                 np.where(same_sign, (mag > ul) & (mag > dr),
                          (mag > ur) & (mag > dl))))

    strong = keep & (mag > high)
    weak = keep & (mag > low) & ~strong

    # hysteresis: BFS from strong pixels through weak neighbors
    edges = strong.copy()
    stack = list(zip(*np.nonzero(strong)))
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    while stack:
        y, x = stack.pop()
        for dy, dx in offs:
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and weak[ny, nx] and not edges[ny, nx]:
                edges[ny, nx] = True
                stack.append((ny, nx))
    return (edges * 255).astype(np.uint8)


def process_condition_image(condition_image, controlnet_model: str,
                            depth_fn: Optional[Callable] = None):
    """(/root/reference/elastic_diffusion_w_controlnet.py:1102-1117)
    condition_image: PIL.Image or (H, W, 3) array.
    Returns a PIL 3-channel condition image."""
    from PIL import Image
    arr = np.asarray(condition_image)
    if controlnet_model == "canny":
        e = canny(arr, 100, 200)
        return Image.fromarray(np.stack([e, e, e], axis=-1))
    if controlnet_model == "depth":
        if depth_fn is None:
            depth_fn = default_depth_fn()
        d = np.asarray(depth_fn(condition_image), dtype=np.float32)
        d = (255 * (d - d.min()) / max(d.max() - d.min(), 1e-8)).astype(np.uint8)
        return Image.fromarray(np.stack([d, d, d], axis=-1))
    raise ValueError(f"unknown controlnet_model {controlnet_model}")


def prepare_image(image, width: int, height: int, batch_size: int = 1,
                  do_classifier_free_guidance: bool = False) -> np.ndarray:
    """VaeImageProcessor(do_normalize=False) analog
    (/root/reference/elastic_diffusion_w_controlnet.py:1004-1033): resize to
    (height, width), scale to [0,1], NCHW, repeat for batch/CFG."""
    from PIL import Image
    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    image = image.convert("RGB").resize((width, height), Image.LANCZOS)
    arr = np.asarray(image, dtype=np.float32) / 255.0
    arr = arr.transpose(2, 0, 1)[None]
    arr = np.repeat(arr, batch_size, axis=0)
    if do_classifier_free_guidance:
        arr = np.concatenate([arr, arr])
    return arr
