"""Synthetic road-scene point clouds + pose tables.

Stands in for KITTI-360 raw data in tests, CI, and benchmarks: structured
scenes (ground corridor, building walls, scattered poles/cars) generated
deterministically, plus a smooth synthetic trajectory so the pose-matrix
code paths (toWorld/fromWorld) are exercised realistically.  Implements
the ``scan_provider`` protocol of ``data.kitti360``.

World consistency (round 4): real KITTI-360 scans are observations of ONE
world, so a scan warped to a nearby pose agrees with the scan captured
there — that overlap is exactly what the novel-view task conditions on and
what the cross-view consistency merge exploits.  The provider therefore
maintains one *world-frame* corridor cloud per scene group of
``group_frames`` consecutive frames (sized so every Line-dataset view
target ``pose + (k+1)*5`` stays in-group for the leading scenes) and
serves ``scan(frame)`` as that cloud expressed in frame's sensor pose with
a per-frame random subsample — different hole patterns per view, same
underlying geometry.  The pre-round-4 provider pinned one cloud to each
frame's own sensor frame, which made GT at the target pose statistically
unrelated to the warped input and made joint-vs-baseline ablations
insensitive by construction.
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


def _pose_xy(t: np.ndarray):
    """Analytic trajectory (matches ``poses()`` for t >= 0): position and
    heading; sign-preserving power so corridor margins before t=0 extend
    smoothly instead of going NaN."""
    t = np.asarray(t, np.float64)
    x = 1.2 * t
    y = 0.05 * np.sign(t) * np.abs(t) ** 1.5
    ang = 0.01 * t
    return x, y, ang


def synthetic_world_corridor(
    seed: int, t_lo: float, t_hi: float, n_points: int
) -> np.ndarray:
    """(N, 4) xyz+intensity road corridor IN WORLD COORDINATES along the
    trajectory segment ``t in [t_lo, t_hi]``: ground strip, two wall bands
    following the path at lateral 8-14 m, scattered object clusters.  Local
    geometry seen from any pose on the segment matches the distribution of
    :func:`synthetic_scene_cloud` (ground at z=-1.7, walls to z=4)."""
    rng = np.random.default_rng(seed)

    def path_points(n, lateral_lo, lateral_hi):
        t = rng.uniform(t_lo - 50.0 / 1.2, t_hi + 50.0 / 1.2, n)
        x, y, ang = _pose_xy(t)
        nx, ny = -np.sin(ang), np.cos(ang)  # path normal
        d = rng.uniform(lateral_lo, lateral_hi, n)
        return x + d * nx, y + d * ny, t

    parts = []
    n_ground = n_points // 2
    gx, gy, _ = path_points(n_ground, -60.0, 60.0)
    parts.append(
        np.stack([gx, gy, np.full(n_ground, -1.7) + rng.normal(0, 0.05, n_ground)], axis=1)
    )

    n_wall = n_points // 4
    side = rng.choice([-1.0, 1.0], n_wall)
    wt = rng.uniform(t_lo - 50.0 / 1.2, t_hi + 50.0 / 1.2, n_wall)
    wx, wy, wang = _pose_xy(wt)
    wd = side * rng.uniform(8.0, 14.0, n_wall)
    parts.append(
        np.stack(
            [wx + wd * -np.sin(wang), wy + wd * np.cos(wang),
             rng.uniform(-1.7, 4.0, n_wall)],
            axis=1,
        )
    )

    n_obj = n_points - n_ground - n_wall
    n_centers = max(n_obj // 200, 1)
    cx, cy, _ = path_points(n_centers, -30.0, 30.0)
    idx = rng.integers(0, n_centers, n_obj)
    parts.append(
        np.concatenate(
            [
                np.stack([cx[idx], cy[idx]], axis=1) + rng.normal(0, 0.8, (n_obj, 2)),
                rng.uniform(-1.7, 0.5, (n_obj, 1)),
            ],
            axis=1,
        )
    )

    xyz = np.concatenate(parts).astype(np.float32)
    intensity = rng.uniform(0.05, 0.9, len(xyz)).astype(np.float32)
    return np.concatenate([xyz, intensity[:, None]], axis=1)


class SyntheticScanProvider:
    """scan_provider protocol: ``poses()`` and ``scan(frame)``.

    ``scan(frame)`` = the world corridor of scene group ``frame //
    group_frames`` expressed in frame's sensor pose, with a keep_fraction per-frame
    random subsample (world-consistent views, varying hole patterns — see
    module docstring).  ``group_frames`` defaults to 48 so the Line
    dataset's farthest view target (+35 poses) stays in-group for scenes
    0..12 of each group."""

    def __init__(
        self,
        num_frames: int = 40,
        n_points: int = 30000,
        seed: int = 0,
        group_frames: int = 48,
        keep_fraction: float = 0.7,
    ):
        self.num_frames = num_frames
        self.n_points = n_points
        self.seed = seed
        # World consistency must hold across a whole scene: a Line view
        # target ``pose + (k+1)*5`` that crossed a group boundary would be
        # served from a DIFFERENT corridor cloud, silently reverting those
        # views to uncorrelated GT (the round-4 bug class).  Growing the
        # group to cover every frame keeps one world per run whenever
        # num_frames > group_frames; scene variety comes from the corridor
        # content varying along its span.
        self.group_frames = max(group_frames, num_frames)
        self.keep_fraction = keep_fraction
        self._worlds: Dict[int, np.ndarray] = {}

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

    def _world(self, g: int) -> np.ndarray:
        if g not in self._worlds:
            t_lo = float(g * self.group_frames)
            # +36: Line view targets reach pose + 35 past the group start
            t_hi = float((g + 1) * self.group_frames + 36)
            span_m = 1.2 * (t_hi - t_lo) + 120.0  # corridor + end margins
            # density-matched to the old 120 m-diameter disk scene
            n_world = int(self.n_points * span_m / 120.0)
            self._worlds[g] = synthetic_world_corridor(
                self.seed + g, t_lo, t_hi, n_world
            )
        return self._worlds[g]

    def scan(self, frame: int) -> np.ndarray:
        frame = int(frame)
        world = self._world(frame // self.group_frames)
        rng = np.random.default_rng(self.seed * 7919 + frame)
        keep = rng.random(len(world)) < self.keep_fraction
        pts = world[keep]
        t = float(frame)
        ang = 0.01 * t
        c, s = np.cos(ang), np.sin(ang)
        # inverse of the pose: world -> sensor
        xy = pts[:, :2] - np.array([1.2 * t, 0.05 * t**1.5], np.float32)
        local = np.empty_like(pts)
        local[:, 0] = c * xy[:, 0] + s * xy[:, 1]
        local[:, 1] = -s * xy[:, 0] + c * xy[:, 1]
        local[:, 2] = pts[:, 2]
        local[:, 3] = pts[:, 3]
        return local


class _ItemCacheMixin:
    """Memoize ``__getitem__`` by index.

    Synthetic items are fully deterministic (seeded per frame), so the
    second epoch onwards is free.  Sized for this corpus: 1920 items of
    ~2 MB ≈ 4 GB host RAM, far below the box's 125 GB.  Without it the
    one-world provider is host-bound (~102 ms/item vs the 54 ms device
    budget on the 1-core box).  Disable with ``data.cache_items: false``.
    """

    def _init_item_cache(self, config):
        self._item_cache = {} if cfg_get(config, "data.cache_items", True) else None

    def __getitem__(self, idx):
        cache = getattr(self, "_item_cache", None)
        if cache is None:
            return super().__getitem__(idx)
        out = cache.get(idx)
        if out is None:
            out = super().__getitem__(idx)
            cache[idx] = out
        return out


class SyntheticScenes(_ItemCacheMixin, KITTI360Im8Batch):
    """KITTI360Im8Batch running on synthetic scans (dataset: "synthetic")."""

    def __init__(self, config, split: str = "train"):
        provider = SyntheticScanProvider(
            num_frames=cfg_get(config, "data.synthetic_frames", 40),
            n_points=cfg_get(config, "data.synthetic_points", 30000),
            seed=0 if split == "train" else 10_000,
            keep_fraction=cfg_get(config, "data.synthetic_keep", 0.7),
        )
        super().__init__(config, split=split, scan_provider=provider)
        self._init_item_cache(config)


class SyntheticAllForOne(_ItemCacheMixin, KITTI360ImAllForOne):
    def __init__(self, config, split: str = "train"):
        provider = SyntheticScanProvider(
            num_frames=cfg_get(config, "data.synthetic_frames", 40),
            n_points=cfg_get(config, "data.synthetic_points", 30000),
            seed=0 if split == "train" else 10_000,
            keep_fraction=cfg_get(config, "data.synthetic_keep", 0.7),
        )
        super().__init__(config, split=split, scan_provider=provider)
        self._init_item_cache(config)
