"""NumPy oracles transcribed from the reference equations (SURVEY §4.1).

Each function re-states the math of the cited reference lines in plain numpy,
following the reference's own sequential/unfold structure, so the fused
TPU-side gathers can be tested for exact equality. These are test fixtures,
not product code.
"""

import math
from fractions import Fraction

import numpy as np


def nearest_interpolate(x, size, bottom=False, right=False):
    """torch F.interpolate(mode='nearest') + flips
    (/root/reference/elastic_diffusion.py:868-883)."""
    if bottom:
        x = x[..., ::-1, :]
    if right:
        x = x[..., :, ::-1]
    H, W = x.shape[-2], x.shape[-1]
    oh, ow = size
    ri = np.minimum(np.floor(np.arange(oh) * H / oh).astype(int), H - 1)
    ci = np.minimum(np.floor(np.arange(ow) * W / ow).astype(int), W - 1)
    x = x[..., ri, :][..., :, ci]
    if bottom:
        x = x[..., ::-1, :]
    if right:
        x = x[..., :, ::-1]
    return x


def get_views(H, W, h_ws, w_ws, stride):
    """latent-space view boxes (/root/reference/elastic_diffusion.py:197-229)."""
    nbh = math.ceil((H - h_ws) / stride) + 1 if stride else 1
    nbw = math.ceil((W - w_ws) / stride) + 1 if stride else 1
    views = []
    for i in range(int(nbh * nbw)):
        h_start = int((i // nbw) * stride)
        h_end = h_start + h_ws
        if h_end > H:
            h_start -= h_end - H
            h_end = H
            h_start = max(0, h_start)
        w_start = int((i % nbw) * stride)
        w_end = w_start + w_ws
        if w_end > W:
            w_start -= w_end - W
            w_end = W
            w_start = max(0, w_start)
        views.append((h_start, h_end, w_start, w_end))
    return views


def crop_with_context(X, a, b, c, d, S, n):
    """(/root/reference/elastic_diffusion.py:706-757)"""
    B, C, H, W = X.shape
    if a - n * S < 0:
        top_rows = np.arange(max(0, a - n * S), a - S + 1, S)
        n_b = 2 * n - len(top_rows)
        bottom_rows = np.arange(b - 1 + S, min(H, b + n_b * S), S)
    else:
        bottom_rows = np.arange(b - 1 + S, min(H, b + n * S), S)
        n_t = 2 * n - len(bottom_rows)
        top_rows = np.arange(max(0, a - n_t * S), a - S + 1, S)
    if c - n * S < 0:
        left_cols = np.arange(max(0, c - n * S), c - S + 1, S)
        n_r = 2 * n - len(left_cols)
        right_cols = np.arange(d - 1 + S, min(W, d + n_r * S), S)
    else:
        right_cols = np.arange(d - 1 + S, min(W, d + n * S), S)
        n_l = 2 * n - len(right_cols)
        left_cols = np.arange(max(0, c - n_l * S), c - S + 1, S)

    x_inds = np.concatenate([top_rows, np.arange(a, b), bottom_rows]).astype(int)
    top = X[:, :, top_rows.astype(int), c:d]
    bottom = X[:, :, bottom_rows.astype(int), c:d]
    left = X[:, :, x_inds, :][:, :, :, left_cols.astype(int)]
    right = X[:, :, x_inds, :][:, :, :, right_cols.astype(int)]
    vertical = np.concatenate([top, X[:, :, a:b, c:d], bottom], axis=2)
    final = np.concatenate([left, vertical, right], axis=3)
    return final, (len(top_rows), len(bottom_rows), len(left_cols), len(right_cols))


def local_writeback(latent_shape, views, margins, preds):
    """Sequential first-writer-wins (/root/reference/elastic_diffusion.py:852-861)."""
    out = np.zeros(latent_shape, dtype=preds.dtype)
    for v, ((a, b, c, d), (n_t, n_b, n_l, n_r)) in enumerate(zip(views, margins)):
        pred = preds[v]
        sh = (n_t, pred.shape[-2] - n_b)
        sw = (n_l, pred.shape[-1] - n_r)
        region = out[:, :, a:b, c:d]
        nz = region != 0
        src = pred[:, :, sh[0]:sh[1], sw[0]:sw[1]]
        region[~nz] = src[~nz]
    return out


def to_even_rational(f, max_block_sz=32):
    frac = Fraction(f).limit_denominator(max_block_sz)
    if frac.numerator % 2 != 0 or frac.denominator % 2 != 0:
        frac = Fraction(f).limit_denominator(max_block_sz // 2)
    if frac.numerator % 2 != 0 or frac.denominator % 2 != 0:
        return frac.numerator * 2, frac.denominator * 2
    return frac.numerator, frac.denominator


def get_keep_blocks(tensor, n):
    """(/root/reference/elastic_diffusion.py:478-499)"""
    num_blocks = n // 2
    mask = np.ones_like(tensor, dtype=bool)
    interval = len(tensor) // (num_blocks + 1)
    if interval % 2 != 0:
        interval += 1
    cnt = 0
    masked_blocks = []
    for i in range(num_blocks):
        start = (i + 1) * interval - 1
        masked_blocks.extend([start - 1 - cnt * 2, start + 2 - (cnt + 1) * 2])
        mask[start:start + 2] = False
        cnt += 1
    return tensor[mask], np.asarray(masked_blocks, dtype=int)


def restore_mask_shape(M, A, dim):
    """(/root/reference/elastic_diffusion.py:446-465)"""
    i, j = 0, 0
    R = []
    while i < M.shape[dim]:
        if j < len(A) and i == A[j]:
            if dim == 0:
                R.append(M[i:i + 1, :])
                R.append(M[i + 1:i + 2, :])
            else:
                R.append(M[:, i:i + 1])
                R.append(M[:, i + 1:i + 2])
            j += 2
        else:
            if dim == 0:
                R.append(M[i:i + 1, :] | M[i + 1:i + 2, :])
            else:
                R.append(M[:, i:i + 1] | M[:, i + 1:i + 2])
        i += 2
    return np.concatenate(R, axis=dim)


def random_downsample_given_indices(inp, factor, random_indices):
    """random_downsample with the random pick injected
    (/root/reference/elastic_diffusion.py:522-558). Returns (down, mask)."""
    B, C, H, W = inp.shape
    nh, nw = H // factor, W // factor
    mask = np.zeros((H, W), dtype=bool)
    # unfold: blocks in row-major order; within-block index row-major
    blocks = inp.reshape(B, C, nh, factor, nw, factor).transpose(0, 1, 2, 4, 3, 5)
    blocks = blocks.reshape(B, C, nh * nw, factor * factor)
    down = blocks[:, :, np.arange(nh * nw), random_indices].reshape(B, C, nh, nw)

    idx_h, idx_w = np.meshgrid(np.arange(nh), np.arange(nw), indexing="ij")
    ri = random_indices.reshape(nh, nw)
    sampled_h = (idx_h * factor + ri // factor).ravel()
    sampled_w = (idx_w * factor + ri % factor).ravel()
    mask[sampled_h, sampled_w] = True
    return down, mask


def random_nearest_downsample_given_indices(inp, downsample_size, random_indices):
    """random_nearest_downsample with injected per-block picks
    (/root/reference/elastic_diffusion.py:560-630). Returns (down, mask)."""
    B, C, H, W = inp.shape
    resized = nearest_interpolate(inp, (H * 2, W * 2))

    r_n_keep, r_block_sz = to_even_rational(downsample_size[0] / H)
    r_n_remove = r_block_sz - r_n_keep
    c_n_keep, c_block_sz = to_even_rational(downsample_size[1] / W)
    c_n_remove = c_block_sz - c_n_keep

    r_num_blocks = (downsample_size[0] * 2) // r_n_keep
    c_num_blocks = (downsample_size[1] * 2) // c_n_keep
    if r_num_blocks * r_block_sz > H * 2:
        r_num_blocks -= 1
    if c_num_blocks * c_block_sz > W * 2:
        c_num_blocks -= 1
    r_blocks = r_num_blocks * r_block_sz
    c_blocks = c_num_blocks * c_block_sz

    offsets, r_masked = get_keep_blocks(np.arange(r_block_sz), r_n_remove)
    row_indices = (np.arange(0, r_blocks, r_block_sz)[:, None] + offsets).ravel()
    row_indices = row_indices[row_indices < H * 2]
    mask_row_indices = (np.arange(0, downsample_size[0] * 2, r_n_keep)[:, None]
                        + r_masked).ravel() if len(r_masked) else np.asarray([], int)

    offsets, c_masked = get_keep_blocks(np.arange(c_block_sz), c_n_remove)
    col_indices = (np.arange(0, c_blocks, c_block_sz)[:, None] + offsets).ravel()
    col_indices = col_indices[col_indices < W * 2]
    mask_col_indices = (np.arange(0, downsample_size[1] * 2, c_n_keep)[:, None]
                        + c_masked).ravel() if len(c_masked) else np.asarray([], int)

    r_remain = downsample_size[0] * 2 - len(row_indices)
    c_remain = downsample_size[1] * 2 - len(col_indices)
    rows = np.concatenate([resized[:, :, row_indices, :],
                           resized[:, :, r_blocks:r_blocks + r_remain]], axis=2)
    resized = np.concatenate([rows[:, :, :, col_indices],
                              rows[:, :, :, c_blocks:c_blocks + c_remain]], axis=3)

    down, mask = random_downsample_given_indices(resized, 2, random_indices)
    mask = restore_mask_shape(mask, mask_row_indices, 0)
    mask = restore_mask_shape(mask, mask_col_indices, 1)
    if H > mask.shape[0]:
        mask = np.concatenate([mask, np.zeros((H - mask.shape[0], mask.shape[1]), bool)], 0)
    if W > mask.shape[1]:
        mask = np.concatenate([mask, np.zeros((mask.shape[0], W - mask.shape[1]), bool)], 1)
    return down, mask[:H, :W]


def fill_in_nan(target, direction, mask, fill_all):
    """NaN-sentinel fill (/root/reference/elastic_diffusion.py:633-647)."""
    up = nearest_interpolate(direction, (target.shape[-2], target.shape[-1]))
    target = np.where(mask, up, target)
    if fill_all:
        target = np.where(np.isnan(target), up, target)
    return target
