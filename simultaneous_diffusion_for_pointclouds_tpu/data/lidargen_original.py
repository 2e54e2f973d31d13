"""LiDARGen-original single-image datasets.

Covers the reference's ``datasets/kitti.py``, ``datasets/lidar.py``,
``datasets/kitti_getMissingPoints.py`` and ``datasets/nuscenes.py``: one
range image per raw scan using the semantic-kitti-api projection
(:func:`host_projection.project_point_cloud_og`), negatives zeroed,
``log2(d+1)/6`` compression, optional random azimuth roll.  NuScenes uses a
32x1024 grid with +10..-30 deg FoV.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict

import numpy as np

from ..config import cfg_get
from .host_projection import project_point_cloud_og
from .pose import load_velodyne_bin


class KITTIRaw:
    """One log-range image per raw KITTI(-360) velodyne scan
    (datasets/kitti.py)."""

    rows, cols = 64, 1024
    fov_up, fov_down = 3.0, -25.0

    def __init__(self, config, split: str = "train", scan_provider=None):
        self.return_remission = cfg_get(config, "data.channels", 2) == 2
        self.random_roll = cfg_get(config, "data.random_roll", False)
        self._provider = scan_provider
        if scan_provider is not None:
            self.full_list = list(range(scan_provider.num_frames))
            return
        root = cfg_get(config, "data.root", os.environ.get("KITTI360_DATASET", "/data/KITTI-360"))
        self.full_list = self._discover(root, split)

    def _discover(self, root, split):
        """File listing + split; subclasses override for their layouts."""
        full_list = glob(os.path.join(root, "data_3d_raw/*/velodyne_points/data/*.bin"))
        if split == "train":
            return [
                f for f in full_list if "0000_sync" not in f and "0001_sync" not in f
            ]
        return [f for f in full_list if "0000_sync" in f or "0001_sync" in f]

    def __len__(self):
        return len(self.full_list)

    def _scale(self, real):
        return np.log2(real + 1.0) / 6.0

    def _scan(self, idx):
        if self._provider is not None:
            return self._provider.scan(idx)
        return load_velodyne_bin(self.full_list[idx])

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        scan = self._scan(idx)
        rng_img, rem_img, idx_img = project_point_cloud_og(
            scan, self.rows, self.cols, self.fov_up, self.fov_down
        )
        real = np.where(rng_img < 0, 0, rng_img) + 0.0001
        real = np.clip(self._scale(real), 0, 1)
        roll = np.random.randint(self.cols) if self.random_roll else 0
        if self.random_roll:
            real = np.roll(real, roll, axis=1)
        real = real[None]
        if self.return_remission:
            intensity = np.clip(rem_img, 0, 1.0)
            if self.random_roll:
                intensity = np.roll(intensity, roll, axis=1)
            real = np.concatenate([real, intensity[None]], axis=0)
        return dict(
            real=real.astype(np.float32),
            known=(real > 0.0001).astype(np.float32),
            sky=np.ones((1,) + real.shape[1:], np.float32),
            index=idx_img[None],
        )


class KITTIGetMissing(KITTIRaw):
    """datasets/kitti_getMissingPoints.py: identical pipeline; the index
    image marks which raw points never landed in the image ("missing")."""

    def __getitem__(self, idx):
        item = super().__getitem__(idx)
        scan = self._scan(idx)
        present = np.zeros(len(scan), bool)
        hit = item["index"][0]
        present[hit[hit >= 0].astype(int)] = True
        item["missing_fraction"] = np.float32(1.0 - present.mean())
        return item


class NuScenesDataset(KITTIRaw):
    """datasets/nuscenes.py: 32x1024 grid, +10..-30 deg FoV, 5-float scans.

    Debugged redesign of the reference's discovery: the reference globs a
    hardcoded ``.../nuscenes/extracted/sweeps/LIDAR_TOP/*`` for train and
    returns an EMPTY list for every other split (nuscenes.py:172-178); here
    ``data.root`` points at the nuScenes root, both ``sweeps/`` and
    ``samples/`` LIDAR_TOP listings are used, and a deterministic 90/10
    train/test split is applied.  Range compression is the reference's
    ``log2(d+1)/6.5`` (nuscenes.py:203 — not KITTI's /6), or linear /104
    when ``data.lidar_scaling: linear`` (:205)."""

    rows, cols = 32, 1024
    fov_up, fov_down = 10.0, -30.0

    def __init__(self, config, split: str = "train", scan_provider=None):
        self.linear_scaling = (
            cfg_get(config, "data.lidar_scaling", "log") == "linear"
        )
        super().__init__(config, split, scan_provider)

    def _discover(self, root, split):
        files = sorted(
            glob(os.path.join(root, "sweeps", "LIDAR_TOP", "*.pcd.bin"))
            + glob(os.path.join(root, "samples", "LIDAR_TOP", "*.pcd.bin"))
        )
        split_at = len(files) * 9 // 10
        return files[:split_at] if split == "train" else files[split_at:]

    def _scale(self, real):
        if self.linear_scaling:
            return real / 104.0
        return np.log2(real + 1.0) / 6.5

    def _scan(self, idx):
        if self._provider is not None:
            return self._provider.scan(idx)
        path = self.full_list[idx]
        # nuScenes LIDAR_TOP .pcd.bin files hold 5 floats per point
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, 5)
        return pts[:, :4]


class LiDARSingle:
    """dataset: "lidar" — the reference's single-image debug dataset
    (datasets/lidar.py:11-44): ONE pre-projected range image loaded from
    ``<exp>/datasets/lidar/0_200.npy``, negatives zeroed, ``log2(d+1)/6``
    compressed, clipped to [0, 1], then standardized to zero mean / unit
    std, and served ``length`` (1000) times for overfitting runs
    (configs/lidar.yml)."""

    length = 1000

    def __init__(self, config, split: str = "train", exp: str = "exp"):
        path = cfg_get(
            config, "data.root", os.path.join(exp, "datasets", "lidar")
        )
        real = np.load(os.path.join(path, "0_200.npy")).astype(np.float32)
        real = np.where(real < 0, 0, real) + 0.0001
        real = np.clip(np.log2(real + 1.0) / 6.0, 0, 1)
        real -= real.mean()
        real /= real.std()
        h = cfg_get(config, "data.image_size")
        w = cfg_get(config, "data.image_width")
        self.real = real.reshape(1, h, w)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        real = self.real
        return dict(
            real=real,
            known=np.ones_like(real),
            sky=np.ones_like(real),
            index=np.zeros_like(real, dtype=np.int64),
        )
