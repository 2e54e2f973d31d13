"""HDVMine (mining LiDAR) dataset family.

Covers the reference's four variants:

- ``HDVMinePreGenerated`` / ``HDVMinePreGenerated8Batch``: pre-generated
  ``Depth/ Mask/ Intensity/`` npy folders; 8-batch variant serves
  views-per-scene triplets for simultaneous training
  (``datasets/HDVMinePreGenerated8Batch.py``; note the reference's shipped
  8Batch __getitem__ references undefined ``sky``/``index`` variables —
  here the sky mask is all-usable when no ``Sky/`` folder exists).
- ``HDVMineGenerate``: h5 point clouds projected on the fly
  (``datasets/HDVMineGenerate.py``).
- ``HDVMineGenerateFromInvidivualScans``: per-scan h5 files
  (``datasets/HDVMineGenerateFromInvidivualScans.py``).

Mining-range compression is ``log2(d+1)/11`` (max range ~2047 m), unlike
KITTI's ``/6``; intensities are divided by 5000.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict

import numpy as np

from ..config import cfg_get
from ..ops.geometry import MAX_RANGE
from .host_projection import project_point_cloud

LOG_DIV_MINE = 11.0


def _finalize_mine(real, intensity, mask, sky):
    mask = np.where(real >= 2057, 1, mask)
    real = np.where(real >= 2057, 0, real) + 0.0001
    real = np.clip(np.log2(real + 1.0) / LOG_DIV_MINE, 0, 1)
    sky = sky.copy()
    sky[3:] = sky[:-3]
    intensity = intensity / 5000.0
    mask = np.where(intensity >= 1, 1, mask)
    intensity = np.clip(np.where(intensity >= 1, 0, intensity) + 0.0001, 1e-7, 1.0)
    real2 = np.stack([real, intensity]).astype(np.float32)
    mask2 = np.stack([mask, mask])
    return real2, mask2, sky


class HDVMinePreGenerated8Batch:
    """Views-per-scene triplets from pre-generated npy folders."""

    def __init__(self, config, split: str = "train"):
        self.views = cfg_get(config, "sampling.batch_size", 8)
        self.rows = cfg_get(config, "data.image_size", 64)
        self.cols = cfg_get(config, "data.image_width", 1024)
        root_train = cfg_get(config, "data.pregen_root", "/data/PreGenFinal/PreGenFinal")
        root_val = cfg_get(config, "data.pregen_val_root", "/data/PreGenFinalVal")
        self.root = root_train if split == "train" else root_val
        self.folders = sorted(glob(os.path.join(self.root, "Depth", "*")))

    def __len__(self):
        return len(self.folders) * self.views

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        view = idx % self.views
        folder = os.path.basename(self.folders[idx // self.views])

        def load(kind):
            return np.load(os.path.join(self.root, kind, folder, f"{view}.npy"))[
                : self.rows, : self.cols
            ]

        real = load("Depth")
        mask = load("Mask")
        intensity = load("Intensity")
        sky_path = os.path.join(self.root, "Sky", folder, f"{view}.npy")
        sky = (
            np.load(sky_path)[: self.rows, : self.cols]
            if os.path.isfile(sky_path)
            else np.zeros_like(real, dtype=bool)
        )
        real2, mask2, sky = _finalize_mine(real, intensity, mask, sky)
        return dict(
            real=real2,
            known=np.logical_not(mask2).astype(np.float32),
            sky=np.logical_not(sky)[None].astype(np.float32),
        )


class HDVMinePreGenerated(HDVMinePreGenerated8Batch):
    """Single view per item (reference ``HDVMinePreGenerated.py``)."""

    def __init__(self, config, split: str = "train"):
        super().__init__(config, split)
        self.views = 1


class HDVMineGenerate:
    """Project mining h5 clouds on the fly (``HDVMineGenerate.py``):
    point clouds in ``Input`` datasets, intensity from RGB luma."""

    def __init__(self, config, split: str = "train"):
        self.rows = cfg_get(config, "data.image_size", 64)
        self.cols = cfg_get(config, "data.image_width", 1024)
        root = cfg_get(config, "data.hdvmine_root", "/data/HDVMine")
        self.files = sorted(glob(os.path.join(root, "*.h5")))
        if split == "test":
            self.files = self.files[: max(1, len(self.files) // 5)]
        else:
            self.files = self.files[max(1, len(self.files) // 5) :] or self.files

    def __len__(self):
        return len(self.files)

    def _load_cloud(self, path):
        import h5py

        with h5py.File(path, "r") as f:
            data = np.asarray(f["Input"])
        xyz = data[:, :3]
        if data.shape[1] >= 6:
            rgb = data[:, 3:6]
            intensity = 0.3 * rgb[:, 0] + 0.6 * rgb[:, 0] + 0.11 * rgb[:, 2]
        else:
            intensity = np.zeros(len(xyz))
        return np.concatenate([xyz, intensity[:, None]], axis=1)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        cloud = self._load_cloud(self.files[idx])
        origin = np.median(cloud[:, :3], axis=0)
        img = project_point_cloud(cloud, origin, self.rows, self.cols)
        real2, mask2, sky = _finalize_mine(img.depth, img.intensity * 5000.0, img.mask, img.sky)
        return dict(
            real=real2,
            known=np.logical_not(mask2).astype(np.float32),
            sky=np.logical_not(sky)[None].astype(np.float32),
        )


class HDVMineGenerateFromIndividualScans:
    """Per-scan raw-npy variant (``HDVMineGenerateFromInvidivualScans.py:
    13-110``): ``RawScans/Scans/*.npy`` point clouds with per-scan origins
    at ``RawScans/Origins/<name>``, 60/40 train/test split over the file
    list, ``sampling.batch_size`` views per scan at ``origin +
    modifications[view] * modScale``.

    Reference quirks reproduced: the scan index is overridden to a fixed
    scan (":91 scanOrigin = 2" — ``data.scan_override``, clamped to the
    available scans) while ``modScale`` still follows the pre-override scan
    index + 1; one corrupt file is skipped by name (:46-48); intensity is
    /2000 here (:147, not the pregenerated family's /5000); the sky mask is
    shifted down via three single-row shifts (:136-139)."""

    SKIPPED = "20100603 penrice_stn15_nth_C8L_02.npy"

    def __init__(self, config, split: str = "train"):
        self.views = cfg_get(config, "sampling.batch_size", 8)
        self.rows = cfg_get(config, "data.image_size", 64)
        self.cols = cfg_get(config, "data.image_width", 1024)
        self.random_roll = cfg_get(config, "data.random_roll", False)
        self.modifications = np.asarray(
            cfg_get(config, "data.modifications", [[0.0, 0.0, 0.0]]), np.float64
        )
        self.scan_override = cfg_get(config, "data.scan_override", 2)
        root = cfg_get(config, "data.rawscans_root", "RawScans")
        files = sorted(glob(os.path.join(root, "Scans", "*.npy")))
        split_at = len(files) * 6 // 10
        files = files[:split_at] if split == "train" else files[split_at:]
        self.points = []
        self.origins = []
        for path in files:
            name = os.path.basename(path)
            if name == self.SKIPPED:
                continue
            self.points.append(np.load(path))
            self.origins.append(np.load(os.path.join(root, "Origins", name)))

    def __len__(self):
        return len(self.points) * self.views

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        scan = (idx // self.views) % len(self.points)
        mod_scale = float(scan + 1)
        if self.scan_override is not None:
            scan = min(int(self.scan_override), len(self.points) - 1)
        view = idx % self.views
        origin = (
            np.asarray(self.origins[scan], np.float64)
            + self.modifications[view % len(self.modifications)] * mod_scale
        )
        img = project_point_cloud(self.points[scan], origin, self.rows, self.cols)

        real = img.depth.copy()
        mask = img.mask.astype(np.int64)
        mask = np.where(real >= MAX_RANGE, 1, mask)
        real = np.where(real >= MAX_RANGE, 0.0, real) + 0.0001
        real = np.clip(np.log2(real + 1.0) / LOG_DIV_MINE, 0, 1)
        intensity = img.intensity / 2000.0
        mask = np.where(intensity >= 1, 1, mask)
        intensity = np.clip(np.where(intensity >= 1, 0, intensity) + 0.0001, 0, 1.0)
        sky = img.sky.copy()
        for _ in range(3):  # exact triple row-shift (:136-139)
            sky[1:] = sky[:-1]
        index = img.indices
        if self.random_roll:
            roll = np.random.randint(self.cols)
            real = np.roll(real, roll, axis=1)
            mask = np.roll(mask, roll, axis=1)
            sky = np.roll(sky, roll, axis=1)
            intensity = np.roll(intensity, roll, axis=1)
            index = np.roll(index, roll, axis=1)
        real2 = np.stack([real, intensity]).astype(np.float32)
        mask2 = np.stack([mask, mask])
        return dict(
            real=real2,
            known=np.logical_not(mask2).astype(np.float32),
            sky=np.logical_not(sky)[None].astype(np.float32),
            index=index[None].astype(np.float32),
            mod_scale=np.float32(mod_scale),
            scan_id=np.int64(scan),
        )


def get_hdvmine_dataset(name: str, config):
    table = {
        "HDVMinePreGenerated": HDVMinePreGenerated,
        "HDVMinePreGenerated8Batch": HDVMinePreGenerated8Batch,
        "HDVMineGenerate": HDVMineGenerate,
        "HDVMineGenerateFromInvidivualScans": HDVMineGenerateFromIndividualScans,
    }
    cls = table[name]
    return cls(config, split="train"), cls(config, split="test")
