"""Patch-view geometry: static host-side plans for the local signal.

Reference behavior being reproduced (all host-side index math, never traced):
  - get_views            /root/reference/elastic_diffusion.py:197-229
  - crop_with_context    /root/reference/elastic_diffusion.py:706-757
  - collapsed-dim edge   /root/reference/elastic_diffusion.py:819-825
  - first-writer-wins    /root/reference/elastic_diffusion.py:852-861

TPU-first design: the reference crops views in a Python loop, runs the UNet
per `view_batch_size` chunk, and writes back in-place sequentially. Here all
views have identical static shapes, so the whole local pass becomes ONE
batched gather (V stacked index vectors), ONE batched UNet call (shardable
over a 'views' mesh axis), and ONE gather writeback through a precomputed
first-writer owner map — deterministic by construction, no atomics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from elasticdiffusion_tpu.configs import ViewConfig


def get_views(panorama_height: int, panorama_width: int, h_ws: int = 64,
              w_ws: int = 64, stride: int = 32, vae_scale_factor: int = 8,
              **_ignored) -> List[Tuple[int, int, int, int]]:
    """View boxes over the latent grid, pixel-space API like the reference
    (/root/reference/elastic_diffusion.py:197-229). Returns latent-space
    (h_start, h_end, w_start, w_end) tuples with last-row/col snap-back.

    Deviation: the reference `raise`s a plain string there (a TypeError in
    practice); we raise a proper ValueError.
    """
    if panorama_height % vae_scale_factor or panorama_width % vae_scale_factor:
        raise ValueError(
            f"height {panorama_height} and width {panorama_width} must be "
            f"divisible by {vae_scale_factor}")
    H = panorama_height // vae_scale_factor
    W = panorama_width // vae_scale_factor
    return get_views_latent(H, W, h_ws=h_ws, w_ws=w_ws, stride=stride)


def get_views_latent(H: int, W: int, h_ws: int, w_ws: int,
                     stride: int) -> List[Tuple[int, int, int, int]]:
    """Same as get_views but directly in latent units."""
    nbh = math.ceil((H - h_ws) / stride) + 1 if stride else 1
    nbw = math.ceil((W - w_ws) / stride) + 1 if stride else 1
    views = []
    for i in range(int(nbh * nbw)):
        h_start = int((i // nbw) * stride)
        h_end = h_start + h_ws
        if h_end > H:  # snap back the last row
            h_start = max(0, h_start - (h_end - H))
            h_end = H
        w_start = int((i % nbw) * stride)
        w_end = w_start + w_ws
        if w_end > W:
            w_start = max(0, w_start - (w_end - W))
            w_end = W
        views.append((h_start, h_end, w_start, w_end))
    return views


def _context_lines(start: int, end: int, limit: int, S: int, n: int):
    """Strided context line indices on both sides of [start, end), with the
    reference's border rebalancing (/root/reference/elastic_diffusion.py:706-745):
    when one side is short, the other side gets up to 2n total.

    Returns (before_idx, after_idx) numpy arrays.
    """
    if start - n * S < 0:
        before = np.arange(max(0, start - n * S), start - S + 1, S)
        n_after = 2 * n - len(before)
        after = np.arange(end - 1 + S, min(limit, end + n_after * S), S)
    else:
        after = np.arange(end - 1 + S, min(limit, end + n * S), S)
        n_before = 2 * n - len(after)
        before = np.arange(max(0, start - n_before * S), start - S + 1, S)
    return before, after


def crop_with_context_indices(H: int, W: int, a: int, b: int, c: int, d: int,
                              S: int, n: int):
    """Index vectors for one context crop.

    Returns (rows, cols, (n_t, n_b, n_l, n_r)): gathering X[rows][:, cols]
    equals the reference's crop_with_context output, whose layout is
    [top ctx | a:b | bottom ctx] x [left ctx | c:d | right ctx].
    """
    top, bottom = _context_lines(a, b, H, S, n)
    left, right = _context_lines(c, d, W, S, n)
    rows = np.concatenate([top, np.arange(a, b), bottom]).astype(np.int64)
    cols = np.concatenate([left, np.arange(c, d), right]).astype(np.int64)
    return rows, cols, (len(top), len(bottom), len(left), len(right))


@dataclass(frozen=True)
class ViewPlan:
    """Static plan for the local-uncond pass at one latent resolution."""

    latent_h: int
    latent_w: int
    views: Tuple[Tuple[int, int, int, int], ...]
    # stacked context-crop gathers: latent[:, :, rows[v][:,None], cols[v][None,:]]
    rows: np.ndarray          # (V, out_h) int32
    cols: np.ndarray          # (V, out_w) int32
    margins: np.ndarray       # (V, 4) int32: n_t, n_b, n_l, n_r
    # first-writer-wins writeback gather: out[y,x] = preds[ov, :, oy, ox]
    owner_view: np.ndarray    # (H, W) int32
    owner_y: np.ndarray       # (H, W) int32 (row inside the view output)
    owner_x: np.ndarray       # (H, W) int32

    @property
    def num_views(self) -> int:
        return len(self.views)

    @property
    def out_shape(self) -> Tuple[int, int]:
        return (self.rows.shape[1], self.cols.shape[1])


def build_view_plan(latent_h: int, latent_w: int, view_config: ViewConfig) -> ViewPlan:
    """Build the complete static plan for compute_local_uncond_signal.

    Collapsed-dim edge case (/root/reference/elastic_diffusion.py:819-825):
    when window + context >= latent extent in a dimension, the window covers
    the whole extent and no context lines are used in that dimension.
    """
    ctx = view_config.context_size
    h_ws = latent_h if view_config.window_size + ctx >= latent_h else view_config.window_size
    w_ws = latent_w if view_config.window_size + ctx >= latent_w else view_config.window_size

    views = get_views_latent(latent_h, latent_w, h_ws=h_ws, w_ws=w_ws,
                             stride=view_config.stride)
    n = ctx // 2
    rows_l, cols_l, margins_l = [], [], []
    for (a, b, c, d) in views:
        rows, cols, m = crop_with_context_indices(latent_h, latent_w, a, b, c, d,
                                                  S=1, n=n)
        rows_l.append(rows)
        cols_l.append(cols)
        margins_l.append(m)
    out_hs = {len(r) for r in rows_l}
    out_ws = {len(c) for c in cols_l}
    assert len(out_hs) == 1 and len(out_ws) == 1, (
        f"views produced ragged context crops: {out_hs}x{out_ws}")
    rows = np.stack(rows_l).astype(np.int32)
    cols = np.stack(cols_l).astype(np.int32)
    margins = np.asarray(margins_l, dtype=np.int32)

    # first-writer-wins: owner = lowest view index covering each pixel
    owner_view = np.full((latent_h, latent_w), -1, dtype=np.int32)
    owner_y = np.zeros((latent_h, latent_w), dtype=np.int32)
    owner_x = np.zeros((latent_h, latent_w), dtype=np.int32)
    for v, (a, b, c, d) in enumerate(views):
        n_t, n_b, n_l, n_r = margins[v]
        region = owner_view[a:b, c:d]
        fresh = region == -1
        yy, xx = np.nonzero(fresh)
        owner_view[a:b, c:d][yy, xx] = v
        owner_y[a:b, c:d][yy, xx] = n_t + yy
        owner_x[a:b, c:d][yy, xx] = n_l + xx
    assert (owner_view >= 0).all(), "views do not tile the latent grid"

    return ViewPlan(latent_h=latent_h, latent_w=latent_w, views=tuple(views),
                    rows=rows, cols=cols, margins=margins,
                    owner_view=owner_view, owner_y=owner_y, owner_x=owner_x)


def gather_views(latent: jnp.ndarray, plan: ViewPlan) -> jnp.ndarray:
    """(B, C, H, W) -> (V, B, C, out_h, out_w) batched context crops.

    One fused gather replaces the reference's per-view Python crop loop
    (/root/reference/elastic_diffusion.py:834-845).
    """
    rows = jnp.asarray(plan.rows)          # (V, out_h)
    cols = jnp.asarray(plan.cols)          # (V, out_w)
    # latent[b, c, rows[v, i], cols[v, j]] -> vmap the separable gather over V
    def one(r, c):
        return latent[:, :, r, :][:, :, :, c]
    return jax.vmap(one)(rows, cols)


def scatter_first_writer(preds: jnp.ndarray, plan: ViewPlan) -> jnp.ndarray:
    """(V, B, C, out_h, out_w) -> (B, C, H, W) via the owner-map gather.

    Matches the reference's sequential 'write where still zero' loop
    (/root/reference/elastic_diffusion.py:852-861) except for the measure-zero
    case of a prediction being exactly 0.0 (documented deviation: the
    reference would let a later view overwrite such a pixel).
    """
    ov = jnp.asarray(plan.owner_view)
    oy = jnp.asarray(plan.owner_y)
    ox = jnp.asarray(plan.owner_x)
    out = preds[ov, :, :, oy, ox]          # (H, W, B, C)
    return jnp.transpose(out, (2, 3, 0, 1))
