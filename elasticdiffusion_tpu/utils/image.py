"""Image assembly helpers (SURVEY C27): PIL conversion, grids."""

from __future__ import annotations

import numpy as np


def to_pil(img_nchw) -> list:
    """(B, 3, H, W) in [0,1] -> list of PIL images."""
    from PIL import Image
    arr = np.clip(np.asarray(img_nchw, dtype=np.float32), 0.0, 1.0)
    arr = (arr * 255).round().astype(np.uint8).transpose(0, 2, 3, 1)
    return [Image.fromarray(a) for a in arr]


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
