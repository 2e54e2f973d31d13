"""KITTI-360 calibration / pose loading.

Replicates reference ``datasets/kitti360_im_8Batch.py:49-68`` and
``datasets/lidar_utils.py:12-32``: ``velo -> cam -> pose`` chaining and the
``poses.txt`` -> frame-indexed 4x4 world transforms (with the reference's
``frames - 1`` off-by-one preserved).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

DEFAULT_DRIVE = "2013_05_28_drive_0000_sync"


def _loadtxt_calib(path: str, row0: bool = False) -> np.ndarray:
    """Load a KITTI-360 calibration file as a (3, 4) matrix.

    The real KITTI-360 distribution prefixes ``calib_cam_to_pose.txt`` rows
    with camera names (``image_00: ...``); the reference's dataset loader
    assumes a stripped copy (kitti360_im_8Batch.py:53) while its
    ``lidar_utils.load_matrices`` (lidar_utils.py:18-20) skips the label with
    ``usecols``.  Accept both layouts.
    """
    try:
        vals = np.loadtxt(path)
    except ValueError:
        vals = np.loadtxt(path, usecols=tuple(range(1, 13)))
    if row0:
        vals = np.atleast_2d(vals)[0]
    # remaining layouts reshape directly: one 12-value row, or 3 rows of 4
    return np.reshape(vals, [3, 4])


def load_velo_to_pose(root: str) -> np.ndarray:
    velo_to_cam = _loadtxt_calib(os.path.join(root, "calibration/calib_cam_to_velo.txt"))
    velo_to_cam = np.concatenate((velo_to_cam, np.array([[0.0, 0.0, 0.0, 1.0]])))
    velo_to_cam = np.linalg.inv(velo_to_cam)

    cam_to_pose = _loadtxt_calib(
        os.path.join(root, "calibration/calib_cam_to_pose.txt"), row0=True
    )
    cam_to_pose = np.concatenate((cam_to_pose, np.array([[0.0, 0.0, 0.0, 1.0]])))

    return np.matmul(cam_to_pose, velo_to_cam)


def load_poses(root: str, drive: str = DEFAULT_DRIVE) -> Tuple[np.ndarray, Dict[float, np.ndarray]]:
    """Returns (frames, {frame: velo->world 4x4}).

    ``frames`` are the pose-file frame ids minus 1, matching the reference's
    indexing of raw velodyne scans (kitti360_im_8Batch.py:63).
    """
    velo_to_pose = load_velo_to_pose(root)
    poses = np.loadtxt(os.path.join(root, f"data_poses/{drive}/poses.txt"))
    frames = poses[:, 0] - 1
    mats = np.reshape(poses[:, 1:], [-1, 3, 4])
    tr_pose_world: Dict[float, np.ndarray] = {}
    for frame, pose in zip(frames, mats):
        pose = np.concatenate((pose, np.array([[0.0, 0.0, 0.0, 1.0]])))
        tr_pose_world[frame] = np.matmul(pose, velo_to_pose)
    return frames, tr_pose_world


def load_velodyne_bin(path: str) -> np.ndarray:
    """Raw KITTI .bin scan -> (N, 4) float32 [x, y, z, intensity]."""
    if not os.path.isfile(path):
        raise RuntimeError(f"{path} does not exist!")
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
