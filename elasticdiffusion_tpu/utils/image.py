"""Image assembly helpers (SURVEY C27): PIL conversion, grids."""

from __future__ import annotations

import numpy as np


def to_pil(img_nchw) -> list:
    """(B, 3, H, W) in [0,1] -> list of PIL images.

    Minimizes full-array passes on the host (this environment's single slow
    core makes each 50 MB float pass ~1 s at 2048^2): one clip (new array,
    never mutates the caller's), in-place scale+rint, then uint8 transpose
    so the PIL copy moves 12 MB instead of 50."""
    from PIL import Image
    arr = np.clip(np.asarray(img_nchw, dtype=np.float32), 0.0, 1.0)
    arr *= 255.0
    np.rint(arr, out=arr)
    arr = arr.astype(np.uint8).transpose(0, 2, 3, 1)
    return [Image.fromarray(np.ascontiguousarray(a)) for a in arr]


def to_pil_device(img_nchw_dev) -> list:
    """(B, 3, H, W) device array in [0,1] -> list of PIL images.

    TPU-first to_pil: clip/scale/round/uint8/NHWC all run ON DEVICE, so the
    host fetch moves 12 MB of uint8 instead of 50 MB of float32 (the remote
    tunnel moves ~2.6 MB/s: 19 s -> ~5 s at 2048^2) and the slow host core
    does zero float math."""
    import jax.numpy as jnp
    from PIL import Image
    u8 = jnp.transpose(
        jnp.round(jnp.clip(img_nchw_dev, 0.0, 1.0) * 255.0),
        (0, 2, 3, 1)).astype(jnp.uint8)
    return [Image.fromarray(a) for a in np.asarray(u8)]


def make_grid(imgs_nchw, nrow: int = 8, padding: int = 2) -> np.ndarray:
    """torchvision.utils.make_grid semantics (row-major, padded borders).
    imgs: (B, C, H, W) in [0,1] -> (C, gh, gw)."""
    imgs = np.asarray(imgs_nchw, dtype=np.float32)
    B, C, H, W = imgs.shape
    ncol = min(nrow, B)
    nrows = int(np.ceil(B / ncol))
    gh = nrows * (H + padding) + padding
    gw = ncol * (W + padding) + padding
    grid = np.zeros((C, gh, gw), dtype=np.float32)
    for idx in range(B):
        r, c = divmod(idx, ncol)
        y = padding + r * (H + padding)
        x = padding + c * (W + padding)
        grid[:, y:y + H, x:x + W] = imgs[idx]
    return grid
