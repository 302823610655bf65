"""Native C++ planner must agree exactly with the Python plan builders."""

import numpy as np
import pytest

from elasticdiffusion_tpu.configs import ViewConfig
from elasticdiffusion_tpu.ops import native_planner as npl
from elasticdiffusion_tpu.ops.resample import (
    _axis_plan, build_resample_plan, to_even_rational,
)
from elasticdiffusion_tpu.ops.views import (
    build_view_plan, crop_with_context_indices, get_views_latent,
)

pytestmark = pytest.mark.skipif(not npl.available(),
                                reason="native planner unavailable")


@pytest.mark.parametrize("H,W,ws,stride", [
    (64, 96, 32, 32), (128, 256, 64, 64), (65, 97, 32, 32), (42, 64, 42, 42),
])
def test_views_match(H, W, ws, stride):
    assert npl.build_views(H, W, ws, ws, stride) == \
        get_views_latent(H, W, ws, ws, stride)


@pytest.mark.parametrize("box", [(0, 32, 0, 32), (32, 64, 64, 96),
                                 (0, 42, 10, 42)])
def test_crop_context_match(box):
    H, W, n = 64, 96, 16
    a, b, c, d = box
    rows_p, cols_p, m_p = crop_with_context_indices(H, W, a, b, c, d, 1, n)
    rows_n, cols_n, m_n = npl.crop_context_indices(H, W, a, b, c, d, 1, n)
    np.testing.assert_array_equal(rows_n, rows_p)
    np.testing.assert_array_equal(cols_n, cols_p)
    assert m_n == m_p


def test_owner_map_match():
    vc = ViewConfig(window_size=32, stride=32, context_size=32)
    plan = build_view_plan(65, 96, vc)
    ov, oy, ox = npl.owner_map(65, 96, list(plan.views), plan.margins)
    np.testing.assert_array_equal(ov, plan.owner_view)
    np.testing.assert_array_equal(oy, plan.owner_y)
    np.testing.assert_array_equal(ox, plan.owner_x)


def test_rational_match():
    for f in [42 / 64, 0.5, 21 / 48, 5 / 16, 8 / 24, 1.0, 0.999, 13 / 17,
              52 / 100, 64 / 67, 64 / 124]:
        assert npl.to_even_rational(f) == to_even_rational(f), f


@pytest.mark.parametrize("in_s,out_s", [
    (64, 42), (128, 64), (256, 128), (16, 5), (24, 8), (67, 64), (124, 64),
    (100, 52), (135, 64),
])
def test_axis_plan_match(in_s, out_s):
    src_p, mask_p = _axis_plan(in_s, out_s, out_s * 2)
    src_n, mask_n = npl.axis_plan(in_s, out_s)
    np.testing.assert_array_equal(src_n, src_p)
    np.testing.assert_array_equal(mask_n, mask_p)


@pytest.mark.parametrize("in_s,out_s", [(48, 21)])
def test_axis_plan_crash_shapes_refused(in_s, out_s):
    """Odd effective keep counts crash the reference; both impls refuse."""
    with pytest.raises(AssertionError):
        _axis_plan(in_s, out_s, out_s * 2)
    with pytest.raises(AssertionError):
        npl.axis_plan(in_s, out_s)
