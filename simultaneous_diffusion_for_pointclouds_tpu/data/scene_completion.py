"""Semantic-scene-completion dataset (reference
``datasets/kitti360_im_SceneCompletion.py``).

Loads SSC test ``.npy`` clouds, re-centers them to the KITTI rough median,
voxel-subsamples at 5 cm (native extension / numpy fallback), fits the road
line through the XY plane with two linear regressions (Z-slope strip, then
XY slope) and auto-places synthetic view origins at the intersections of
that line with circles of radius 35/40/50/30 m around the scan centre
(views 0..3), the centre itself (view 4), and ``config.data.modifications``
for any further views.  Prior-round completion points (``Final/<scan>.npy``)
are merged into every view except the centre one.

The reference uses shapely for the circle-line intersection; here it is a
closed-form quadratic.  Like the reference, shapely's first intersection
along the segment from the negated endpoint is selected.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict

import numpy as np
from scipy import stats

from ..config import cfg_get
from ..ops.geometry import MAX_RANGE
from .host_projection import project_point_cloud
from .subsampling import grid_sub_sampling

ROUGH_MEDIAN = np.array([0.73530043, 0.12196524, -1.23688836])


def line_circle_first_intersection(slope, intercept, radius, endpoint):
    """First intersection of y = slope*x + intercept with the origin circle,
    ordered along the segment from ``endpoint`` (the reference passes
    ``(-x0, -y0)`` as segment start; shapely returns intersections in that
    order)."""
    a = 1.0 + slope**2
    b = 2.0 * slope * intercept
    c = intercept**2 - radius**2
    disc = b**2 - 4 * a * c
    if disc < 0:
        return None
    r = np.sqrt(disc)
    xs = np.array([(-b - r) / (2 * a), (-b + r) / (2 * a)])
    pts = np.stack([xs, slope * xs + intercept], axis=1)
    d = np.linalg.norm(pts - np.asarray(endpoint), axis=1)
    return pts[np.argmin(d)]


def fit_road_origins(scan_points: np.ndarray, num_views: int, modifications: np.ndarray):
    """Reference road-fitting logic (:255-375): returns (num_views, 3)."""
    pts = scan_points[:, :3]
    z_slope, z_intercept, *_ = stats.linregress(pts[:, 0], pts[:, 2])
    above = pts[:, 0] * z_slope + z_intercept + 0.1 <= pts[:, 2]
    pts = pts[above]
    slope, intercept, *_ = stats.linregress(pts[:, 0], pts[:, 1])

    def endpoint(radius, via_y: bool):
        # replicates the reference's (quirky) endpoint construction
        if via_y:
            y = 1.0
            x = y * slope + intercept
        else:
            x = 1.0
            y = x * slope + intercept
        mod = (radius * 200) / np.sqrt(x**2 + y**2)
        x = x * mod
        y = x * slope + intercept
        return (-x, -y)

    fourth = line_circle_first_intersection(slope, intercept, 30, endpoint(30, True))
    first = line_circle_first_intersection(slope, intercept, 35, endpoint(35, True))
    second = line_circle_first_intersection(slope, intercept, 40, endpoint(40, False))
    third = line_circle_first_intersection(slope, intercept, 50, endpoint(50, False))

    z_intercept_shift = z_intercept + (1.23688836 / 2)

    def with_z(p):
        if p is None:
            return np.zeros(3)
        return np.array([p[0], p[1], p[0] * z_slope + z_intercept_shift])

    origins = []
    named = [with_z(first), with_z(second), with_z(third), with_z(fourth), np.zeros(3)]
    for k in range(num_views):
        if k < 5:
            origins.append(named[k])
        elif k < len(modifications):
            origins.append(np.asarray(modifications[k], float))
        else:
            origins.append(np.zeros(3))
    return np.stack(origins)


class KITTI360SceneCompletion:
    def __init__(self, config, split: str = "test", scan_provider=None):
        self.config = config
        self.views = cfg_get(config, "sampling.batch_size", 8)
        self.rows = cfg_get(config, "data.image_size", 64)
        self.cols = cfg_get(config, "data.image_width", 1024)
        self.modifications = np.array(cfg_get(config, "data.modifications", [[0, 0, 0]]))
        root = cfg_get(
            config, "data.ssc_root", "/data/KITTI-360/data_3d_raw/data_3d_ssc_test"
        )
        self.root = root
        self._provider = scan_provider
        if scan_provider is None:
            self.full_list = sorted(glob(os.path.join(root, "velodyne_points/data/*.npy")))
        else:
            self.full_list = [f"synthetic_{i}" for i in range(scan_provider.num_frames)]

    def __len__(self):
        return len(self.full_list) * self.views

    def _load(self, scan_idx: int) -> np.ndarray:
        if self._provider is not None:
            return self._provider.scan(scan_idx)
        return np.load(self.full_list[scan_idx])

    def _extra(self, name: str) -> np.ndarray:
        path = os.path.join(self.root, "Final", name + ".npy")
        if os.path.isfile(path):
            extra = np.load(path)
            extra = extra.copy()
            if extra.shape[1] > 3:
                extra[:, 3] = 0
            return extra
        return np.zeros((0, 4))

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        view = idx % self.views
        scan_idx = idx // self.views
        name = (
            os.path.basename(self.full_list[scan_idx])[:-4]
            if self._provider is None
            else self.full_list[scan_idx]
        )

        original = np.asarray(self._load(scan_idx), np.float64)
        if original.shape[1] < 4:
            original = np.concatenate(
                [original, np.zeros((len(original), 1))], axis=1
            )
        mean_xyz = np.median(original[:, :3], axis=0)
        original[:, :3] = original[:, :3] - mean_xyz + ROUGH_MEDIAN

        extra = self._extra(name)
        if len(extra):
            extra = extra.copy()
            extra[:, :3] = extra[:, :3] - mean_xyz + ROUGH_MEDIAN

        sub = grid_sub_sampling(original[:, :3].astype(np.float32), sampleDl=0.05)
        sub = np.concatenate([sub, np.zeros((len(sub), 1), np.float32)], axis=1)

        if view < 8:
            origins = fit_road_origins(sub, self.views, self.modifications)
            origin = origins[view]
        else:
            origin = self.modifications[view] if view < len(self.modifications) else np.zeros(3)
            origins = None

        # Note: the reference concatenates prior-round points onto the
        # (regression) cloud after fitting (:392) but projects
        # ``originalPoints`` — the extra points never reach the image, so
        # they are loaded (for I/O parity) and intentionally unused here.
        del extra

        img = project_point_cloud(original, origin, self.rows, self.cols)

        mask = np.where(img.depth >= MAX_RANGE, 1, img.mask)
        real = np.where(img.depth >= MAX_RANGE, 0, img.depth) + 0.0001
        real = np.clip(np.log2(real + 1.0) / 6.0, 0, 1)

        intensity = img.intensity
        mask = np.where(intensity >= 1, 1, mask)

        sky = img.sky.copy()
        sky[3:] = sky[:-3]

        # depth duplicated into both channels; intensity channel fully
        # unconditioned (:489-497)
        real2 = np.stack([real, real]).astype(np.float32)
        mask2 = np.stack([mask, np.ones_like(mask)])

        all_origins = (
            origins if origins is not None
            else np.tile(origin[None], (self.views, 1))
        )
        return dict(
            real=real2,
            known=np.logical_not(mask2).astype(np.float32),
            sky=np.logical_not(sky)[None].astype(np.float32),
            index=img.indices[None],
            scan_name=name,
            origins=np.asarray(all_origins, np.float32),
        )
