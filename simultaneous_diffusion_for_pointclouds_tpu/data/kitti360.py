"""KITTI-360 range-image datasets.

Re-implementations of the reference dataset family, each ``__getitem__``
producing one *view* of a scene so that a contiguous block of
``actualBatchSize`` indices forms one jointly-denoised scene:

- :class:`KITTI360Im8Batch` ("Line", novel views along road poses) —
  reference ``datasets/kitti360_im_8Batch.py``
- :class:`KITTI360ImAllForOne` ("Circle", offset views supporting one
  target) — ``datasets/kitti360_im_AllForOne.py``
- :class:`KITTI360ImSimultaneousDensification` (sparse->dense via views) —
  ``datasets/kitti360_im_simultenous_densification.py``
- :class:`KITTI360SingleView` (LiDARGen-style one image per scan) —
  ``datasets/kitti.py`` / ``datasets/kitti360_im.py``

Items are dicts of numpy arrays (the reference returns 9-tuples; named
fields are kinder to runners).  Scan sources are pluggable via
``scan_provider`` so tests/benchmarks can substitute synthetic scans for
the KITTI-360 files expected under ``config.data.root``
(default ``/data/KITTI-360``).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Callable, Dict, Optional

import numpy as np

from ..config import cfg_get
from ..ops.geometry import MAX_RANGE
from .host_projection import project_point_cloud
from .pose import DEFAULT_DRIVE, load_poses, load_velodyne_bin

MOVEMENT_MODIFIER = 5  # poses between consecutive synthetic views (:163)


def _log_compress_img(img):
    return np.clip(np.log2(img + 1.0) / 6.0, 0.0, 1.0)


def finalize_view(
    real_depth,
    real_intensity,
    mask,
    sky,
    goal_depth,
    goal_intensity,
):
    """Shared post-projection processing (kitti360_im_8Batch.py:221-291):
    max-range pixels masked out and zeroed (+1e-4), log compression, sky
    shifted down 3 rows, intensity>=1 invalidated, channels assembled."""
    mask = np.where(real_depth >= MAX_RANGE, 1, mask)
    real_depth = np.where(real_depth >= MAX_RANGE, 0, real_depth) + 0.0001
    goal_depth = np.where(goal_depth >= MAX_RANGE, 0, goal_depth) + 0.0001
    real_depth = _log_compress_img(real_depth)
    goal_depth = _log_compress_img(goal_depth)

    mask = np.where(real_intensity >= 1, 1, mask)
    real_intensity = np.clip(np.where(real_intensity >= 1, 0, real_intensity) + 0.0001, 0, 1.0)
    goal_intensity = np.clip(np.where(goal_intensity >= 1, 0, goal_intensity) + 0.0001, 0, 1.0)

    sky = sky.copy()
    sky[3:] = sky[:-3]  # three one-row shifts (:260-263)

    real = np.stack([real_depth, real_intensity]).astype(np.float32)
    goal = np.stack([goal_depth, goal_intensity]).astype(np.float32)
    mask2 = np.stack([mask, mask])
    return real, mask2, sky, goal


class _KITTI360Base:
    """Pose table + scan loading shared by the view datasets."""

    def __init__(self, config, split="train", scan_provider: Optional[Callable] = None):
        self.config = config
        self.split = split
        self.views = cfg_get(config, "sampling.actualBatchSize", 8)
        self.rows = cfg_get(config, "data.image_size", 64)
        self.cols = cfg_get(config, "data.image_width", 1024)
        self.modifications = np.array(cfg_get(config, "data.modifications", [[0, 0, 0]]))
        self.root = cfg_get(config, "data.root", "/data/KITTI-360")
        self.drive = cfg_get(config, "data.drive", DEFAULT_DRIVE)
        self._scan_provider = scan_provider

        if scan_provider is None:
            self.frames, self.tr_pose_world = load_poses(self.root, self.drive)
        else:
            # synthetic mode: provider also supplies poses
            self.frames, self.tr_pose_world = scan_provider.poses()

    # -- scan access -------------------------------------------------------
    def load_scan(self, frame: int) -> np.ndarray:
        if self._scan_provider is not None:
            return self._scan_provider.scan(frame)
        path = os.path.join(
            self.root, "data_3d_raw", self.drive, "velodyne_points/data",
            f"{int(frame):010d}.bin",
        )
        return load_velodyne_bin(path)

    def __len__(self):
        return len(self.frames) * self.views

    def _project(self, points, origin):
        img = project_point_cloud(points, np.asarray(origin, float), self.rows, self.cols)
        return img


class KITTI360Im8Batch(_KITTI360Base):
    """"Line" novel-view synthesis: view k of scene p re-expresses scene p's
    scan in the frame of pose ``p + (k+1)*5`` and pairs it with the real scan
    captured there as ground truth (kitti360_im_8Batch.py:94-304)."""

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        view = idx % self.views
        pose_idx = idx // self.views
        frame = int(self.frames[pose_idx])

        scan = self.load_scan(frame)
        intensity = scan[:, -1]
        pts_h = np.concatenate(
            [scan[:, :3].T, np.ones((1, len(scan)))], axis=0
        )

        to_world = self.tr_pose_world[self.frames[pose_idx]]
        to_og_view = np.linalg.inv(to_world)
        pts_h = to_world @ pts_h

        pose_desired = min(pose_idx + (view + 1) * MOVEMENT_MODIFIER, len(self.frames) - 1)
        to_world = self.tr_pose_world[self.frames[pose_desired]]
        from_world = np.linalg.inv(to_world)
        pts_h = from_world @ pts_h
        points = np.concatenate([pts_h[:-1], intensity[None]], axis=0).T

        goal_scan = self.load_scan(int(self.frames[pose_desired]))

        origin = np.zeros(3)
        real = self._project(points, origin)
        goal = self._project(goal_scan, origin)

        img, mask2, sky, goal_img = finalize_view(
            real.depth, real.intensity, real.mask, real.sky, goal.depth, goal.intensity
        )
        return dict(
            real=img,
            known=np.logical_not(mask2).astype(np.float32),
            sky=np.logical_not(sky)[None].astype(np.float32),
            index=real.indices[None],
            to_world=to_world.astype(np.float32),
            from_world=from_world.astype(np.float32),
            goal=goal_img,
            to_og_view=to_og_view.astype(np.float32),
            scan_id=np.int64(frame),
        )


class KITTI360ImAllForOne(_KITTI360Base):
    """"Circle": all views share scene p's scan expressed in the frame of
    pose ``p + 2*5``, each projected from a per-view offset origin
    ``config.data.modifications[k]`` (kitti360_im_AllForOne.py:150-360)."""

    GOAL_MOVEMENT = 2

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        view = idx % self.views
        pose_idx = idx // self.views
        frame = int(self.frames[pose_idx])

        scan = self.load_scan(frame)
        intensity = scan[:, -1]
        pts_h = np.concatenate([scan[:, :3].T, np.ones((1, len(scan)))], axis=0)

        to_world = self.tr_pose_world[self.frames[pose_idx]]
        to_og_view = np.linalg.inv(to_world)
        pts_h = to_world @ pts_h

        pose_desired = min(
            pose_idx + self.GOAL_MOVEMENT * MOVEMENT_MODIFIER, len(self.frames) - 1
        )
        to_world = self.tr_pose_world[self.frames[pose_desired]]
        from_world = np.linalg.inv(to_world)
        pts_h = from_world @ pts_h
        points = np.concatenate([pts_h[:-1], intensity[None]], axis=0).T

        goal_scan = self.load_scan(int(self.frames[pose_desired]))
        origin = self.modifications[view]

        real = self._project(points, origin)
        goal = self._project(goal_scan, origin)
        img, mask2, sky, goal_img = finalize_view(
            real.depth, real.intensity, real.mask, real.sky, goal.depth, goal.intensity
        )
        return dict(
            real=img,
            known=np.logical_not(mask2).astype(np.float32),
            sky=np.logical_not(sky)[None].astype(np.float32),
            index=real.indices[None],
            to_world=to_world.astype(np.float32),
            from_world=from_world.astype(np.float32),
            goal=goal_img,
            to_og_view=to_og_view.astype(np.float32),
            scan_id=np.int64(frame),
        )


class KITTI360ImSimultaneousDensification(_KITTI360Base):
    """Densification-via-views: delete the first quarter of azimuth columns
    from the base projection, keep only surviving points, re-project from
    every modification origin; view 0's known-mask marks the deleted strip
    as the conditioning target
    (kitti360_im_simultenous_densification.py:150-290)."""

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        view = idx % self.views
        pose_idx = idx // self.views
        frame = int(self.frames[pose_idx])

        scan = self.load_scan(frame)
        goal_points = scan.copy()

        base = self._project(scan, self.modifications[0])
        index = base.indices.copy()
        index[:, : self.cols // 4] = -2
        survivors = index[index >= 0].astype(int)
        scan = scan[survivors]

        origin = self.modifications[view]
        real = self._project(scan, origin)
        goal = self._project(goal_points, origin)
        img, mask2, sky, goal_img = finalize_view(
            real.depth, real.intensity, real.mask, real.sky, goal.depth, goal.intensity
        )
        if view == 0:
            strip = np.zeros_like(mask2)
            strip[:, :, : self.cols // 4] = 1
            mask2 = strip

        to_world = self.tr_pose_world[self.frames[pose_idx]]
        from_world = np.linalg.inv(to_world)
        return dict(
            real=img,
            known=np.logical_not(mask2).astype(np.float32),
            sky=np.logical_not(sky)[None].astype(np.float32),
            index=real.indices[None],
            to_world=to_world.astype(np.float32),
            from_world=from_world.astype(np.float32),
            goal=goal_img,
            to_og_view=from_world.astype(np.float32),
            scan_id=np.int64(frame),
        )


class KITTI360SingleView(_KITTI360Base):
    """LiDARGen-style single range image per scan (datasets/kitti.py):
    project from the sensor origin, log compress, optional random roll."""

    def __init__(self, config, split="train", scan_provider=None):
        super().__init__(config, split, scan_provider)
        self.random_roll = cfg_get(config, "data.random_roll", False)

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        frame = int(self.frames[idx])
        scan = self.load_scan(frame)
        real = self._project(scan, np.zeros(3))
        img, mask2, sky, _ = finalize_view(
            real.depth, real.intensity, real.mask, real.sky, real.depth, real.intensity
        )
        if self.random_roll:
            roll = np.random.randint(self.cols)
            img = np.roll(img, roll, axis=2)
            mask2 = np.roll(mask2, roll, axis=2)
            sky = np.roll(sky, roll, axis=1)
        return dict(
            real=img,
            known=np.logical_not(mask2).astype(np.float32),
            sky=np.logical_not(sky)[None].astype(np.float32),
            scan_id=np.int64(frame),
        )
