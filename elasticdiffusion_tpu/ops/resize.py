"""Corner-aligned nearest resize.

Behavioral contract (/root/reference/elastic_diffusion.py:868-883): torch
F.interpolate(mode='nearest') picks the source pixel at floor(i * in/out)
(top-left alignment); optional H/W flips select which corner of the block the
sample aligns to ('bottom'/'right' flags).

TPU-first design: output shapes are always static under jit, so the gather
index vectors are computed host-side with numpy and baked as constants — the
device op is a single separable gather that XLA fuses into neighbors.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def nearest_indices(in_size: int, out_size: int, flip: bool = False) -> np.ndarray:
    """Source index for each output position, exact torch 'nearest' semantics."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    idx = np.minimum(idx, in_size - 1)
    if flip:
        # flip input, sample, flip back == sample at mirrored indices:
        # out[i] = in[(in-1) - idx[(out-1) - i]]
        idx = ((in_size - 1) - idx[::-1]).copy()
    return idx


def nearest_resize(x: jnp.ndarray, size, bottom: bool = False, right: bool = False):
    """Nearest resize of NCHW (or ...HW) array to `size`=(H,W).

    `bottom`/`right` mirror the reference's flip trick for choosing the
    bottom/right pixel of each source block.
    """
    H_out, W_out = int(size[0]), int(size[1])
    H_in, W_in = x.shape[-2], x.shape[-1]
    if (H_in, W_in) == (H_out, W_out):
        return x
    rows = nearest_indices(H_in, H_out, flip=bottom)
    cols = nearest_indices(W_in, W_out, flip=right)
    return x[..., rows, :][..., :, cols]
