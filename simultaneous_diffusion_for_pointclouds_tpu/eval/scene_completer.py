"""Merge labelled generated views into completed scene clouds.

Port of ``MeasureResults/SceneCompleter.py:60-269``: for each scan, every
generated view image is un-logged and back-projected to world coordinates
(undoing the per-view origin and the dataset's median re-centering), points
are filtered by the sensor-reliability mask, a minimum trusted range
(1.5 m), and the sky heuristic recomputed from the raw scan's re-projection,
then all views plus the original (small-scope) cloud are concatenated into
``Final/<scan>.npy`` with per-point semantic labels.

Label sources are RangeNet++ predictions saved as
``result_rangenet_segmentations/<n>.pth`` (torch) or ``.npy``; they are
mapped to KITTI-360 ids with :data:`iou.RANGENET_TO_KITTI360`.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..data.host_projection import project_point_cloud
from ..data.scene_completion import ROUGH_MEDIAN
from ..ops.geometry import kitti_host_grid
from .iou import map_labels


def _load_labels(folder, filename):
    pth = os.path.join(folder, filename[:-3] + "pth")
    npy = os.path.join(folder, filename[:-3] + "npy")
    if os.path.isfile(pth):
        import torch

        return torch.load(pth, map_location="cpu").numpy()
    if os.path.isfile(npy):
        return np.load(npy)
    return None


def complete_scene(
    views_dir: str,
    raw_scan_path: str,
    out_path: str,
    exist_mask: np.ndarray | None = None,
    rows: int = 64,
    cols: int = 1024,
    final_small_path: str | None = None,
):
    grid = kitti_host_grid(rows, cols)
    az = grid.azimuth()
    el = grid.elevation()
    raw = np.load(raw_scan_path)
    mean_xyz = np.median(raw[:, :3], axis=0)

    clouds = []
    for path in np.sort(glob.glob(os.path.join(views_dir, "*.npy"))):
        filename = os.path.basename(path)
        arr = np.load(path)
        origin_path = os.path.join(views_dir, "Origins", filename)
        origin = np.squeeze(np.load(origin_path)) if os.path.isfile(origin_path) else np.zeros(3)
        labels = _load_labels(os.path.join(views_dir, "result_rangenet_segmentations"), filename)

        # world-frame shift: undo median re-centering and view origin (:106-112)
        final_mod = mean_xyz - (ROUGH_MEDIAN - origin)

        half = arr.shape[0] // 2
        if arr.ndim == 3:  # organised (2, H, W) view: channel 0 is distance
            distance = arr[0]
        else:  # (2B, 3, H, W) completion grid: first half, grid channel 0
            distance = np.squeeze(arr[:half, 0]) if arr.ndim > 2 else arr[:half]
        real_distance = np.power(2.0, np.abs(distance) * 6.0) - 1.0

        px = real_distance * np.cos(az) * np.cos(el) + final_mod[0]
        py = real_distance * np.sin(az) * np.cos(el) + final_mod[1]
        pz = real_distance * np.sin(el) + final_mod[2]

        # sky heuristic from the raw scan seen from this view (:125-250)
        img = project_point_cloud(raw, final_mod, rows, cols)
        sky = _sky_from_xy(img.xy, rows, cols)

        mask = real_distance > 1.5
        if exist_mask is not None:
            mask &= exist_mask.astype(bool)
        mask &= ~sky

        lab = (
            map_labels(labels) if labels is not None else np.zeros((rows, cols), np.int64)
        )
        clouds.append(
            np.stack([px[mask], py[mask], pz[mask], lab[mask]], axis=1)
        )

    if final_small_path and os.path.isfile(final_small_path):
        clouds.append(np.load(final_small_path))

    final = np.concatenate(clouds, 0) if clouds else np.zeros((0, 4))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.save(out_path, final)
    return final


def _sky_from_xy(image_xy, rows, cols):
    from ..ops.geometry import MAX_RANGE

    image_xy = np.asarray(image_xy)
    min_depth = np.full(cols, MAX_RANGE)
    sky = np.zeros((rows, cols), dtype=bool)
    sky[0, :] = True
    sky[1, :] = True
    for r in range(2, rows - 1):
        neq = (
            (image_xy[r, :] != min_depth).astype(int)
            + (image_xy[r - 1, :] != min_depth).astype(int)
            + (image_xy[r + 1, :] != min_depth).astype(int)
        )
        padded = np.concatenate((np.zeros(1), neq, np.zeros(1)))
        flat = (padded[1:-1] + padded[:-2] + padded[2:]) <= 1
        current = flat & sky[r - 1, :]
        sky[r, :] = current
        nm = np.minimum(image_xy[r, :], min_depth)
        min_depth[~current] = nm[~current]
    return sky


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--views_root", required=True, help="Organised per-scan folders")
    p.add_argument("--raw_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--final_small_root", default=None)
    args = p.parse_args()
    for scan_dir in np.sort(glob.glob(os.path.join(args.views_root, "*"))):
        name = os.path.basename(scan_dir)
        complete_scene(
            scan_dir,
            os.path.join(args.raw_root, name + ".npy"),
            os.path.join(args.out_root, name + ".npy"),
            final_small_path=(
                os.path.join(args.final_small_root, name + ".npy")
                if args.final_small_root
                else None
            ),
        )


if __name__ == "__main__":
    main()
