"""Range-image geometry: the single source of truth for projection math.

The reference keeps *two* subtly-divergent copies of the spherical projection
constants — one in the host/numpy input pipeline
(``LiDARGen/datasets/lidar_utils.py:95-114``: ``verticalMin = radians(-25)``)
and one inside every sampler
(``LiDARGen/models/__init__.py:139-205`` / ``models/KITTISampling.py:36-102``:
``verticalMin = ((H*-25)//28)*vA + vA/2`` with flipped azimuth/elevation
grids and an extended ``bigRowCount`` vertical span for reprojection).

Here both conventions are instances of one :class:`RangeGrid`, constructed by
:func:`kitti_host_grid` and :func:`kitti_sampler_grid`.  All angles are in
radians.  Rows/columns follow the reference's flipped layout: row 0 is the
*top* of the image (highest elevation), column 0 is azimuth wrap start, and
device-side reprojection uses the same ``-idx + count - 1`` double flip as
the reference so outputs are pixel-compatible.

Log-range compression is ``log2(d+1)/6`` (clip [0,1]), as in
``datasets/kitti360_im_8Batch.py:226`` and every sampler; the samplers
additionally scale the log space by ``sigmaMod = max(sigma, 1)`` at high
noise (``KITTISampling.py:117-119,166,217``), which the ``sigma_mod``
arguments below encode once.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Largest representable range in metres ("current record set by Penrice",
# reference lidar_utils.py:125); used as the empty-pixel sentinel.
MAX_RANGE = 2057.701

# Log-compression divisor: log2(2047+1) = 11 was the mining-LiDAR max; KITTI
# uses 6 (=> max representable ~2^6-1 = 63m at value 1.0 ... actually 2^6=64).
LOG_DIV = 6.0


@dataclasses.dataclass(frozen=True)
class RangeGrid:
    """Static description of a spherical range-image grid."""

    rows: int
    cols: int
    h_res: float  # radians per column
    v_res: float  # radians per row
    h_min: float  # azimuth of (pre-flip) column 0
    v_min: float  # elevation of (pre-flip) row 0
    big_rows: int  # extended vertical grid used during reprojection
    big_v_min: float  # elevation of (pre-flip) row 0 of the extended grid

    # ---- pixel-centre angle grids (the sampler's flipped convention) ----
    def azimuth(self) -> np.ndarray:
        """Azimuth per column, shape (1, W). Reversed: column j has angle
        (W-1-j)*h_res + h_min (reference models/__init__.py:204)."""
        return ((np.arange(self.cols - 1, -1, -1) * self.h_res) + self.h_min).reshape(
            1, self.cols
        )

    def elevation(self) -> np.ndarray:
        """Elevation per row, shape (H, 1). Reversed like azimuth
        (reference models/__init__.py:205)."""
        return ((np.arange(self.rows - 1, -1, -1) * self.v_res) + self.v_min).reshape(
            self.rows, 1
        )

    def direction_grid(self) -> np.ndarray:
        """Unit direction vector per pixel, shape (H, W, 3)."""
        az = self.azimuth()  # (1, W)
        el = self.elevation()  # (H, 1)
        x = np.cos(az) * np.cos(el)
        y = np.sin(az) * np.cos(el)
        z = np.broadcast_to(np.sin(el), (self.rows, self.cols))
        return np.stack([x, y, z], axis=-1)


def kitti_host_grid(rows: int = 64, cols: int = 1024) -> RangeGrid:
    """Grid with the host input-pipeline constants.

    Matches ``lidar_utils.point_cloud_to_range_image``: 360 deg azimuth,
    vertical scope +3..-25 deg ("LiDARGen's imprecise KITTI specs",
    lidar_utils.py:95-96), ``verticalMin = radians(3 - 28)``
    (lidar_utils.py:114), ``horizontalMin = (W//-2)*hRes + hRes/2``
    (lidar_utils.py:106).
    """
    h_scope, v_scope, v_pos = 360.0, 28.0, 3.0
    h_res = math.radians(h_scope) / cols
    v_res = math.radians(v_scope) / rows
    h_min = (cols // -2) * h_res + h_res / 2
    v_min = math.radians(v_pos - v_scope)
    big_rows = int(max(abs(v_pos - v_scope), abs(v_pos)) * 2 * rows // v_scope)
    big_v_min = (big_rows // -2) * v_res + v_res / 2
    return RangeGrid(rows, cols, h_res, v_res, h_min, v_min, big_rows, big_v_min)


def kitti_sampler_grid(rows: int = 64, cols: int = 1024) -> RangeGrid:
    """Grid with the device sampler constants.

    Matches every simultaneous sampler (models/__init__.py:139-205,
    KITTISampling.py:36-102): scope -180..180 x +3..-25 deg,
    ``horizontalMin = ((W*-180)//360)*hRes + hRes/2``,
    ``verticalMin = ((H*-25)//28)*vRes + vRes/2``, extended grid
    ``bigRowCount = max(25,3)*2*H//28`` with
    ``bigRowMin = (bigRowCount//-2)*vRes + vRes/2``.
    """
    h_scope_min, h_scope_max = -180.0, 180.0
    v_scope_min, v_scope_max = -25.0, 3.0
    h_scope = h_scope_max - h_scope_min
    v_scope = v_scope_max - v_scope_min
    h_res = math.radians(h_scope) / cols
    v_res = math.radians(v_scope) / rows
    h_min = ((cols * h_scope_min) // h_scope) * h_res + h_res / 2
    v_min = ((rows * v_scope_min) // v_scope) * v_res + v_res / 2
    big_rows = int(max(abs(v_scope_min), abs(v_scope_max)) * 2 * rows // v_scope)
    big_v_min = (big_rows // -2) * v_res + v_res / 2
    return RangeGrid(rows, cols, h_res, v_res, h_min, v_min, big_rows, big_v_min)


# --------------------------------------------------------------------------
# Log-range compression
# --------------------------------------------------------------------------


def log_compress(depth_m, sigma_mod=1.0):
    """metres -> log space: ``log2(d+1)/6 * sigma_mod``."""
    return jnp.log2(depth_m + 1.0) / LOG_DIV * sigma_mod


def log_decompress(x, sigma_mod=1.0):
    """log space -> metres (non-negative input)."""
    return jnp.power(2.0, x * LOG_DIV / sigma_mod) - 1.0


def signed_log_decompress(x, sigma_mod=1.0):
    """Signed decode used on diffusing images: magnitude decodes via
    ``2^(|x|*6/sigmaMod)-1`` and the sign is carried through
    (reference models/__init__.py:264-269: ``isNeg`` / ``modifierArray``).
    Returns (distance_m_signed, is_neg[float32]).
    """
    is_neg = (x < 0).astype(jnp.float32)
    sign = 1.0 - 2.0 * is_neg
    dist = (jnp.power(2.0, jnp.abs(x) * LOG_DIV / sigma_mod) - 1.0) * sign
    return dist, is_neg


# --------------------------------------------------------------------------
# Device-side projection / unprojection (jnp, static shapes)
# --------------------------------------------------------------------------


def unproject(depth_m, grid: RangeGrid, origin=None):
    """Per-pixel signed range (…, H, W) -> Cartesian points (…, H, W, 3).

    Uses the sampler's flipped azimuth/elevation grids
    (models/__init__.py:284-287): x = d*cos(az)*cos(el), y = d*sin(az)*cos(el),
    z = d*sin(el), optionally translated by ``origin`` (…, 3).
    """
    az = jnp.asarray(grid.azimuth(), depth_m.dtype)  # (1, W)
    el = jnp.asarray(grid.elevation(), depth_m.dtype)  # (H, 1)
    x = depth_m * (jnp.cos(az) * jnp.cos(el))
    y = depth_m * (jnp.sin(az) * jnp.cos(el))
    z = depth_m * jnp.sin(el)
    pts = jnp.stack([x, y, z], axis=-1)
    if origin is not None:
        pts = pts + jnp.reshape(origin, origin.shape[:-1] + (1, 1, 3))
    return pts


def unproject_soa(depth_m, grid: RangeGrid):
    """:func:`unproject` in structure-of-arrays form: returns (x, y, z) as
    three separate (…, H, W) arrays.

    On TPU a trailing coordinate dim of 3 tiles onto the 128-lane minor
    dimension at 3/128 occupancy whenever XLA materialises it; keeping the
    coordinates as separate full-width planes sidesteps that entirely.
    Same math as :func:`unproject`.
    """
    az = jnp.asarray(grid.azimuth(), depth_m.dtype)  # (1, W)
    el = jnp.asarray(grid.elevation(), depth_m.dtype)  # (H, 1)
    x = depth_m * (jnp.cos(az) * jnp.cos(el))
    y = depth_m * (jnp.sin(az) * jnp.cos(el))
    z = depth_m * jnp.sin(el)
    return x, y, z


def project_bins_soa(px, py, pz, grid: RangeGrid):
    """:func:`project_bins` on separate coordinate planes (see
    :func:`unproject_soa`). Returns (row, col, depth_m, xy_m)."""
    xy2 = jnp.square(px) + jnp.square(py)
    depth = jnp.sqrt(xy2 + jnp.square(pz))
    xy = jnp.sqrt(xy2)
    horizontal = jnp.arctan2(py, px)
    vertical = jnp.arctan2(pz, xy)
    col = jnp.round((horizontal - grid.h_min) / grid.h_res).astype(jnp.int32)
    row = jnp.round((vertical - grid.big_v_min) / grid.v_res).astype(jnp.int32)
    col = -col + grid.cols - 1
    row = -row + grid.big_rows - 1
    return row, col, depth, xy


def project_bins(points, grid: RangeGrid):
    """Cartesian points (…, 3) -> (row, col, depth_m, xy_m) on the *extended*
    vertical grid, replicating the sampler's bin math exactly
    (models/__init__.py:296-338):

      col = round((atan2(y,x) - h_min)/h_res);  col = -col + W - 1
      row = round((atan2(z,xy) - big_v_min)/v_res);  row = -row + big_rows - 1

    Returns int32 rows/cols (unclamped — caller masks with
    ``(-1 < col < W) & (-1 < row < big_rows)``).
    """
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    xy2 = jnp.square(px) + jnp.square(py)
    depth = jnp.sqrt(xy2 + jnp.square(pz))
    xy = jnp.sqrt(xy2)
    horizontal = jnp.arctan2(py, px)
    vertical = jnp.arctan2(pz, xy)
    col = jnp.round((horizontal - grid.h_min) / grid.h_res).astype(jnp.int32)
    row = jnp.round((vertical - grid.big_v_min) / grid.v_res).astype(jnp.int32)
    col = -col + grid.cols - 1
    row = -row + grid.big_rows - 1
    return row, col, depth, xy


def crop_big_with_negatives(big_img, is_neg, grid: RangeGrid, negate_value: bool):
    """Crop an extended-grid image (…, big_rows, W) to (…, H, W), filling
    negative-range pixels from the "opposite" pixel.

    Replicates models/__init__.py:491-493: positive pixels take the last H
    rows of the big image; negative pixels take
    ``flip(roll(big, W//2, axis=cols), axis=rows)`` (same crop), with the
    depth channel additionally negated (``negate_value=True``).

    ``is_neg`` is (…, H, W) float 0/1.
    """
    h = grid.rows
    pos_part = big_img[..., grid.big_rows - h :, :]
    opp = jnp.flip(jnp.roll(big_img, grid.cols // 2, axis=-1), axis=-2)
    neg_part = opp[..., grid.big_rows - h :, :]
    if negate_value:
        neg_part = -neg_part
    return pos_part * (1.0 - is_neg) + neg_part * is_neg


def pose_transform(points, matrices):
    """Apply 4x4 pose matrices to point batches.

    ``points``: (..., N, 3); ``matrices``: (..., 4, 4) broadcastable against
    the leading dims.  Equivalent of the reference's ``torch.bmm(toWorld,
    pointArray)`` on homogeneous stacks (KITTISampling.py:180-190).
    """
    rot = matrices[..., :3, :3]
    trans = matrices[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, points) + trans[..., None, :]


def homogeneous(points):
    """(..., N, 3) -> (..., N, 4) with ones appended."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    return jnp.concatenate([points, ones], axis=-1)
