"""ctypes bindings for the native host-plan builder (native/planner.cpp).

The native library accelerates static plan construction (views, context
crops, owner maps, rational resample axis plans) for large latents; every
entry point has a numpy fallback in ops/{views,resample}.py, and tests assert
exact agreement. Built lazily with `make -C native` on first use.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libedplanner.so")


@functools.lru_cache(maxsize=1)
def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the planner library; None if unavailable."""
    if os.environ.get("ED_DISABLE_NATIVE"):
        return None
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None
    ip = ctypes.POINTER(ctypes.c_int)
    lib.ed_build_views.restype = ctypes.c_int
    lib.ed_build_views.argtypes = [ctypes.c_int] * 5 + [ip, ctypes.c_int]
    lib.ed_crop_context_indices.restype = ctypes.c_int
    lib.ed_crop_context_indices.argtypes = [ctypes.c_int] * 8 + [ip] * 5
    lib.ed_owner_map.restype = ctypes.c_int
    lib.ed_owner_map.argtypes = [ctypes.c_int, ctypes.c_int, ip, ip,
                                 ctypes.c_int, ip, ip, ip]
    lib.ed_to_even_rational.restype = ctypes.c_int
    lib.ed_to_even_rational.argtypes = [ctypes.c_double, ctypes.c_int, ip, ip]
    lib.ed_axis_plan.restype = ctypes.c_int
    lib.ed_axis_plan.argtypes = [ctypes.c_int, ctypes.c_int, ip, ip]
    return lib


def available() -> bool:
    return load_library() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def build_views(H: int, W: int, h_ws: int, w_ws: int, stride: int):
    lib = load_library()
    assert lib is not None
    cap = 4096
    buf = np.zeros((cap, 4), np.int32)
    n = lib.ed_build_views(H, W, h_ws, w_ws, stride, _ptr(buf), cap)
    assert n >= 0, "view buffer overflow"
    return [tuple(int(v) for v in row) for row in buf[:n]]


def crop_context_indices(H, W, a, b, c, d, S, n):
    lib = load_library()
    assert lib is not None
    rows = np.zeros((b - a) + 2 * n + 4, np.int32)
    cols = np.zeros((d - c) + 2 * n + 4, np.int32)
    margins = np.zeros(4, np.int32)
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    lib.ed_crop_context_indices(H, W, a, b, c, d, S, n, _ptr(rows), _ptr(cols),
                                _ptr(margins), ctypes.byref(oh), ctypes.byref(ow))
    return (rows[:oh.value].astype(np.int64), cols[:ow.value].astype(np.int64),
            tuple(int(m) for m in margins))


def owner_map(H, W, views, margins):
    lib = load_library()
    assert lib is not None
    v = np.ascontiguousarray(np.asarray(views, np.int32))
    m = np.ascontiguousarray(np.asarray(margins, np.int32))
    ov = np.zeros(H * W, np.int32)
    oy = np.zeros(H * W, np.int32)
    ox = np.zeros(H * W, np.int32)
    rc = lib.ed_owner_map(H, W, _ptr(v), _ptr(m), len(views), _ptr(ov),
                          _ptr(oy), _ptr(ox))
    assert rc == 0, "views do not tile the latent grid"
    return (ov.reshape(H, W), oy.reshape(H, W), ox.reshape(H, W))


def to_even_rational(f: float, max_block_sz: int = 32):
    lib = load_library()
    assert lib is not None
    keep = ctypes.c_int()
    block = ctypes.c_int()
    lib.ed_to_even_rational(f, max_block_sz, ctypes.byref(keep),
                            ctypes.byref(block))
    return int(keep.value), int(block.value)


def axis_plan(in_size: int, out_size: int):
    lib = load_library()
    assert lib is not None
    cap = 2 * out_size + 64
    src = np.zeros(cap, np.int32)
    mask_of = np.zeros(cap, np.int32)
    L = lib.ed_axis_plan(in_size, out_size, _ptr(src), _ptr(mask_of))
    assert L >= 0, "odd effective keep count (reference crashes here)"
    return src[:L].astype(np.int32), mask_of[:L].astype(np.int32)
