"""Host-side (numpy) point-cloud -> range-image projection.

Bit-compatible re-implementation of the reference input pipeline's
``point_cloud_to_range_image`` (``LiDARGen/datasets/lidar_utils.py:54-347``),
used by the data loaders and as the golden-value oracle for the device-side
projection.  Notable reference behaviours preserved on purpose:

- ``inGrid`` uses *strictly* greater-than 0, so row/column 0 never receive
  points (lidar_utils.py:186).
- The z-buffer keeps the **closest** point per pixel (argsort by depth, first
  unique (row, col) wins, lidar_utils.py:234-251).
- Both image axes are flipped at the end (lidar_utils.py:262-271).
- The "sky" heuristic is computed row-by-row (it feeds the running
  ``minDepth`` that defines the obfuscation mask) but the returned sky mask
  is then zeroed (lidar_utils.py:295 ``skyMask[:] = False``).
- Empty pixels hold ``MAX_RANGE`` in the depth image, 0 in intensity, and
  ``-1`` in the per-pixel point-index image.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..ops.geometry import MAX_RANGE, kitti_host_grid


class RangeImage(NamedTuple):
    depth: np.ndarray  # (H, W) metres; MAX_RANGE where empty
    intensity: np.ndarray  # (H, W); 0 where empty
    mask: np.ndarray  # (H, W) bool obfuscation mask (occluded-by-closer)
    sky: np.ndarray  # (H, W) bool; always all-False (reference disables it)
    indices: np.ndarray  # (H, W) original point index per pixel; -1 if empty
    xy: np.ndarray = None  # (H, W) horizontal distance; MAX_RANGE if empty


def project_point_cloud(
    point_cloud: np.ndarray,
    origin: np.ndarray,
    rows: int = 64,
    cols: int = 1024,
) -> RangeImage:
    """Project an (N, >=3) cloud seen from ``origin`` into a range image.

    Column 3, when present, is treated as intensity (the reference's
    ``return_remission`` path).
    """
    point_cloud = np.asarray(point_cloud)
    has_intensity = point_cloud.shape[1] > 3
    intensity_vals = point_cloud[:, 3] if has_intensity else None
    pts = point_cloud[:, :3].astype(np.float64)

    grid = kitti_host_grid(rows, cols)

    rel = pts - np.asarray(origin, dtype=np.float64)
    xy2 = np.square(rel[:, 0]) + np.square(rel[:, 1])
    depth = np.sqrt(xy2 + np.square(rel[:, 2]))
    horizontal = np.arctan2(rel[:, 1], rel[:, 0])
    xy = np.sqrt(xy2)
    vertical = np.arctan2(rel[:, 2], xy)

    col = np.round((horizontal - grid.h_min) / grid.h_res).astype(int)
    row = np.round((vertical - grid.v_min) / grid.v_res).astype(int)
    col = np.clip(col, 0, cols - 1).astype(np.int32)
    row = np.clip(row, 0, rows - 1).astype(np.int32)

    # Reference masks with strict > 0 on both axes (lidar_utils.py:186).
    in_grid = (col > 0) & (col < cols) & (row > 0) & (row < rows)

    # Closest point per pixel: sort by depth ascending, first unique wins.
    order = np.argsort(depth[in_grid])
    row_s = row[in_grid][order]
    col_s = col[in_grid][order]
    merged = np.stack((row_s, col_s))
    first = np.unique(merged, return_index=True, axis=1)[-1]
    winners = np.arange(len(depth))[in_grid][order][first]
    win_rows = row_s[first]
    win_cols = col_s[first]

    image_depth = np.full((rows, cols), MAX_RANGE)
    image_xy = np.full((rows, cols), MAX_RANGE)
    image_intensity = np.zeros((rows, cols))
    image_indices = np.full((rows, cols), -1.0)

    # Reference scatters through a COO matrix and only overwrites pixels
    # whose scattered depth is non-zero; keep that depth!=0 guard.
    scat = np.zeros((rows, cols))
    scat[win_rows, win_cols] = depth[winners]
    hit = scat != 0
    image_depth[hit] = scat[hit]

    tmp = np.zeros((rows, cols))
    tmp[win_rows, win_cols] = xy[winners]
    image_xy[hit] = tmp[hit]

    tmp = np.zeros((rows, cols))
    tmp[win_rows, win_cols] = winners
    image_indices[hit] = tmp[hit]

    if has_intensity:
        tmp = np.zeros((rows, cols))
        tmp[win_rows, win_cols] = intensity_vals[winners]
        image_intensity[hit] = tmp[hit]

    # Flip both axes so row 0 is the top of the panorama
    # (lidar_utils.py:262-271).
    image_depth = np.flip(image_depth)
    image_intensity = np.flip(image_intensity)
    image_xy = np.flip(image_xy)
    image_indices = np.flip(image_indices).copy()

    mask, sky = _sky_and_obfuscation(image_xy, rows, cols)

    return RangeImage(
        image_depth, image_intensity, mask, sky, image_indices, image_xy
    )


def project_point_cloud_og(
    points: np.ndarray,
    rows: int = 64,
    cols: int = 1024,
    fov_up: float = 3.0,
    fov_down: float = -25.0,
):
    """LiDARGen's original semantic-kitti-api projection
    (``lidar_utils.LaserScan.do_range_projection``, lidar_utils.py:457-517):
    floor-binned yaw/pitch, points ordered by DECREASING depth so closer
    points overwrite, empty pixels hold -1.

    Returns (range_image, remission_image, index_image).
    """
    pts = np.asarray(points, np.float64)
    xyz = pts[:, :3]
    remission = pts[:, 3] if pts.shape[1] > 3 else np.zeros(len(pts))

    fov_up_r = fov_up / 180.0 * np.pi
    fov_down_r = fov_down / 180.0 * np.pi
    fov = abs(fov_down_r) + abs(fov_up_r)

    depth = np.linalg.norm(xyz, 2, axis=1)
    yaw = -np.arctan2(xyz[:, 1], xyz[:, 0])
    pitch = np.arcsin(xyz[:, 2] / np.maximum(depth, 1e-12))

    proj_x = 0.5 * (yaw / np.pi + 1.0) * cols
    proj_y = (1.0 - (pitch + abs(fov_down_r)) / fov) * rows
    proj_x = np.clip(np.floor(proj_x), 0, cols - 1).astype(np.int32)
    proj_y = np.clip(np.floor(proj_y), 0, rows - 1).astype(np.int32)

    order = np.argsort(depth)[::-1]
    rng_img = np.full((rows, cols), -1.0, np.float32)
    rem_img = np.full((rows, cols), -1.0, np.float32)
    idx_img = np.full((rows, cols), -1, np.int32)
    rng_img[proj_y[order], proj_x[order]] = depth[order]
    rem_img[proj_y[order], proj_x[order]] = remission[order]
    idx_img[proj_y[order], proj_x[order]] = np.arange(len(depth))[order]
    return rng_img, rem_img, idx_img


def _sky_and_obfuscation(image_xy: np.ndarray, rows: int, cols: int):
    """Row-scan heuristic from lidar_utils.py:274-309.

    Tracks a per-column running minimum horizontal distance over non-sky
    rows; a pixel more than 5m beyond that minimum is "obfuscated" (a closer
    surface should have blocked it).  Sky propagates down from the top while
    a local flatness test passes.  The returned sky mask is zeroed at the
    end, exactly like the reference (lidar_utils.py:295).
    """
    min_depth = np.full(cols, MAX_RANGE)
    sky = np.zeros((rows, cols), dtype=bool)
    sky[0, :] = True
    sky[1, :] = True
    obf = np.zeros((rows, cols), dtype=bool)

    for r in range(2, rows - 1):
        obf[r, :] = image_xy[r, :] > min_depth + 5

        neq = (
            (image_xy[r, :] != min_depth).astype(int)
            + (image_xy[r - 1, :] != min_depth).astype(int)
            + (image_xy[r + 1, :] != min_depth).astype(int)
        )
        padded = np.concatenate((np.zeros(1), neq, np.zeros(1)))
        flat = padded[1:-1] + padded[:-2] + padded[2:]
        flat = flat <= 1

        current_sky = flat & (sky[r - 1, :] == 1)
        sky[r, :] = current_sky
        not_sky = ~current_sky
        new_min = np.minimum(image_xy[r, :], min_depth)
        min_depth[not_sky] = new_min[not_sky]

    sky[:] = False
    obf[-1, :] = image_xy[-1, :] > min_depth + 5
    return obf, sky
