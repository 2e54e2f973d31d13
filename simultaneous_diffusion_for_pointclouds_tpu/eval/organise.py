"""Reshape batched sampling outputs into the LiDARGen-eval layout.

Port of ``MeasureResults/FileOrganiser.py:30-62``: each batched
``*_completion_*.pth.npy`` (2B, 3, H, W) is split into per-view files
``Organised/k_<view>/<n>.npy`` of shape (2, H, W) so downstream semantic
evaluation (RangeNet++ inference, IoU) sees one scan per file.

    python -m simultaneous_diffusion_for_pointclouds_tpu.eval.organise \
        --src <folder with .npy grids> --dst <folder>/Organised --groups 6
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def organise(src: str, dst: str, groups: int = 6):
    os.makedirs(dst, exist_ok=True)
    current_index = 0
    for path in np.sort(glob.glob(os.path.join(src, "*.npy"))):
        arr = np.load(path)
        distance = arr[: arr.shape[0] // 2]
        intensity = arr[arr.shape[0] // 2 :]
        combined = np.stack((distance, intensity), 1)
        if combined.ndim == 5:  # (B, 2, 3, H, W) grid channels -> take ch 0
            combined = combined[:, :, 0]
        k_nums = distance.shape[0] // groups
        for sample in range(k_nums * groups):
            k_dir = os.path.join(dst, f"k_{sample % k_nums}")
            os.makedirs(k_dir, exist_ok=True)
            np.save(
                os.path.join(k_dir, f"{sample // k_nums + current_index}.npy"),
                combined[sample],
            )
        current_index += groups
    return dst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--groups", type=int, default=6)
    args = p.parse_args()
    organise(args.src, args.dst, args.groups)


if __name__ == "__main__":
    main()
