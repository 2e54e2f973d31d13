"""Golden-parity tests: our host projection vs the reference numpy oracle."""

import os
import sys

import numpy as np
import pytest

from simultaneous_diffusion_for_pointclouds_tpu.data import project_point_cloud
from simultaneous_diffusion_for_pointclouds_tpu.ops import MAX_RANGE


def _reference_project(points, origin, rows, cols):
    """Load the reference implementation read-only as a golden oracle.

    Loaded by file path to avoid the reference package __init__ (which needs
    torchvision, unavailable here).
    """
    import importlib.util

    path = "/root/reference/LiDARGen/datasets/lidar_utils.py"
    spec = importlib.util.spec_from_file_location("_ref_lidar_utils", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.point_cloud_to_range_image(
        points, origin, True, rowMax=rows, colMax=cols, saveNum=0
    )


def _synthetic_cloud(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    # points roughly on road-scene shells: radii 2..80m, elevations in FoV
    r = rng.uniform(2.0, 80.0, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = np.radians(rng.uniform(-24.0, 2.5, n))
    x = r * np.cos(az) * np.cos(el)
    y = r * np.sin(az) * np.cos(el)
    z = r * np.sin(el)
    intensity = rng.uniform(0.0, 1.0, n)
    return np.stack([x, y, z, intensity], axis=1).astype(np.float32)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/LiDARGen"), reason="reference unavailable"
)
@pytest.mark.parametrize("rows,cols", [(64, 1024), (32, 256)])
def test_host_projection_matches_reference(rows, cols):
    pts = _synthetic_cloud()
    origin = np.zeros(3)
    ref_depth, ref_int, ref_mask, _, ref_sky, ref_idx = _reference_project(
        pts, origin, rows, cols
    )
    ours = project_point_cloud(pts, origin, rows=rows, cols=cols)

    np.testing.assert_allclose(ours.depth, ref_depth, rtol=0, atol=1e-9)
    np.testing.assert_allclose(ours.intensity, ref_int, rtol=0, atol=1e-9)
    np.testing.assert_array_equal(ours.mask, ref_mask)
    np.testing.assert_array_equal(ours.sky, ref_sky)
    np.testing.assert_array_equal(ours.indices, ref_idx)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/LiDARGen"), reason="reference unavailable"
)
def test_host_projection_offset_origin_matches_reference():
    pts = _synthetic_cloud(seed=3)
    origin = np.array([5.0, -5.0, 0.5])
    ref = _reference_project(pts, origin, 64, 1024)
    ours = project_point_cloud(pts, origin, rows=64, cols=1024)
    np.testing.assert_allclose(ours.depth, ref[0], rtol=0, atol=1e-9)
    np.testing.assert_array_equal(ours.mask, ref[2])
    np.testing.assert_array_equal(ours.indices, ref[5])


def test_empty_pixels_hold_sentinels():
    pts = _synthetic_cloud(n=100)
    ours = project_point_cloud(pts, np.zeros(3))
    empty = ours.indices == -1
    assert empty.any()
    assert np.all(ours.depth[empty] == MAX_RANGE)
    assert np.all(ours.intensity[empty] == 0)
    # strict >0 in-grid rule: row/col 0 never receive points
    assert np.all(ours.indices[-1, :] == -1)  # pre-flip row 0 == post-flip last row
    assert np.all(ours.indices[:, -1] == -1)
