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


def load_velo_to_pose(root: str) -> np.ndarray:
    velo_to_cam = np.loadtxt(os.path.join(root, "calibration/calib_cam_to_velo.txt"))
    velo_to_cam = np.reshape(velo_to_cam, [3, 4])
    velo_to_cam = np.concatenate((velo_to_cam, np.array([[0.0, 0.0, 0.0, 1.0]])))
    velo_to_cam = np.linalg.inv(velo_to_cam)

    cam_to_pose = np.loadtxt(os.path.join(root, "calibration/calib_cam_to_pose.txt"))[0]
    cam_to_pose = np.reshape(cam_to_pose, [3, 4])
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
