#!/usr/bin/env python
"""Offline range-image pregeneration.

Equivalent of the reference's data-prep scripts (``LiDARGen/makeImages.py``,
``LiDARGen/NearbyImageMakerFilteredFast.py`` minus the proprietary Maptek
SDK ingestion): project point-cloud files (h5 ``Input`` datasets, ``.npy``
clouds, or KITTI ``.bin`` scans) into Depth/Mask/Intensity npy folders that
the HDVMinePreGenerated datasets consume.

    python tools/pregenerate_images.py --src '/data/clouds/*.h5' \
        --out /data/PreGenFinal/PreGenFinal --rows 64 --cols 1024 --views 8
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simultaneous_diffusion_for_pointclouds_tpu.data.host_projection import (
    project_point_cloud,
)

DEFAULT_OFFSETS = np.array(
    [[0, 0, 0], [5, -5, 0], [-5, -5, 0], [0, 5, 0],
     [-10, 10, 0], [10, 10, 0], [-10, 0, 0], [10, 0, 0]], float
)


def load_cloud(path: str) -> np.ndarray:
    if path.endswith(".h5"):
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
    if path.endswith(".npy"):
        arr = np.load(path)
        if arr.shape[1] < 4:
            arr = np.concatenate([arr, np.zeros((len(arr), 1))], axis=1)
        return arr
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="glob of cloud files")
    p.add_argument("--out", required=True)
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--cols", type=int, default=1024)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--center", choices=["median", "none"], default="median")
    args = p.parse_args()

    files = sorted(glob.glob(args.src))
    offsets = DEFAULT_OFFSETS[: args.views]
    for kind in ("Depth", "Mask", "Intensity"):
        os.makedirs(os.path.join(args.out, kind), exist_ok=True)

    for i, path in enumerate(files):
        cloud = load_cloud(path)
        center = (
            np.median(cloud[:, :3], axis=0) if args.center == "median" else np.zeros(3)
        )
        name = os.path.splitext(os.path.basename(path))[0]
        for kind in ("Depth", "Mask", "Intensity"):
            os.makedirs(os.path.join(args.out, kind, name), exist_ok=True)
        for v, off in enumerate(offsets):
            img = project_point_cloud(cloud, center + off, args.rows, args.cols)
            np.save(os.path.join(args.out, "Depth", name, f"{v}.npy"), img.depth)
            np.save(os.path.join(args.out, "Mask", name, f"{v}.npy"), img.mask)
            np.save(
                os.path.join(args.out, "Intensity", name, f"{v}.npy"), img.intensity
            )
        print(f"[{i + 1}/{len(files)}] {name}: {args.views} views", flush=True)


if __name__ == "__main__":
    main()
