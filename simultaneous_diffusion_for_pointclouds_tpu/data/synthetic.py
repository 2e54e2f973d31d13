"""Synthetic road-scene point clouds + pose tables.

Stands in for KITTI-360 raw data in tests, CI, and benchmarks: structured
scenes (ground plane, building walls, scattered poles/cars) generated
deterministically per frame id, plus a smooth synthetic trajectory so the
pose-matrix code paths (toWorld/fromWorld) are exercised realistically.
Implements the ``scan_provider`` protocol of ``data.kitti360``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..config import cfg_get
from .kitti360 import KITTI360Im8Batch, KITTI360ImAllForOne


def synthetic_scene_cloud(seed: int, n_points: int = 30000) -> np.ndarray:
    """(N, 4) xyz+intensity road-like scene around the origin."""
    rng = np.random.default_rng(seed)
    parts = []

    n_ground = n_points // 2
    r = rng.uniform(2.5, 60.0, n_ground)
    az = rng.uniform(-np.pi, np.pi, n_ground)
    parts.append(
        np.stack(
            [r * np.cos(az), r * np.sin(az), np.full(n_ground, -1.7)
             + rng.normal(0, 0.05, n_ground)],
            axis=1,
        )
    )

    n_wall = n_points // 4
    side = rng.choice([-1.0, 1.0], n_wall)
    dist = rng.uniform(8.0, 14.0, n_wall)
    parts.append(
        np.stack(
            [rng.uniform(-50, 50, n_wall), side * dist, rng.uniform(-1.7, 4.0, n_wall)],
            axis=1,
        )
    )

    n_obj = n_points - n_ground - n_wall
    centers = rng.uniform(-30, 30, (max(n_obj // 200, 1), 2))
    idx = rng.integers(0, len(centers), n_obj)
    parts.append(
        np.concatenate(
            [
                centers[idx] + rng.normal(0, 0.8, (n_obj, 2)),
                rng.uniform(-1.7, 0.5, (n_obj, 1)),
            ],
            axis=1,
        )
    )

    xyz = np.concatenate(parts).astype(np.float32)
    intensity = rng.uniform(0.05, 0.9, len(xyz)).astype(np.float32)
    return np.concatenate([xyz, intensity[:, None]], axis=1)


class SyntheticScanProvider:
    """scan_provider protocol: ``poses()`` and ``scan(frame)``."""

    def __init__(self, num_frames: int = 40, n_points: int = 30000, seed: int = 0):
        self.num_frames = num_frames
        self.n_points = n_points
        self.seed = seed

    def poses(self) -> Tuple[np.ndarray, Dict[float, np.ndarray]]:
        frames = np.arange(self.num_frames, dtype=np.float64)
        table = {}
        for f in frames:
            t = float(f)
            ang = 0.01 * t
            c, s = np.cos(ang), np.sin(ang)
            m = np.eye(4)
            m[:2, :2] = [[c, -s], [s, c]]
            m[:3, 3] = [1.2 * t, 0.05 * t**1.5, 0.0]
            table[f] = m
        return frames, table

    def scan(self, frame: int) -> np.ndarray:
        # overlapping geometry between nearby frames: same base scene shifted
        return synthetic_scene_cloud(self.seed + int(frame) // 8, self.n_points)


class SyntheticScenes(KITTI360Im8Batch):
    """KITTI360Im8Batch running on synthetic scans (dataset: "synthetic")."""

    def __init__(self, config, split: str = "train"):
        provider = SyntheticScanProvider(
            num_frames=cfg_get(config, "data.synthetic_frames", 40),
            n_points=cfg_get(config, "data.synthetic_points", 30000),
            seed=0 if split == "train" else 10_000,
        )
        super().__init__(config, split=split, scan_provider=provider)


class SyntheticAllForOne(KITTI360ImAllForOne):
    def __init__(self, config, split: str = "train"):
        provider = SyntheticScanProvider(
            num_frames=cfg_get(config, "data.synthetic_frames", 40),
            n_points=cfg_get(config, "data.synthetic_points", 30000),
            seed=0 if split == "train" else 10_000,
        )
        super().__init__(config, split=split, scan_provider=provider)
