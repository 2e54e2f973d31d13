"""Image-grid output matching the reference's torchvision usage.

The reference expands 2-channel samples to per-channel grayscale tiles,
``make_grid``s them and writes PNGs (ncsn_runner_kitti_simultaneous.py:
653-694, 848-893).  Re-implemented with numpy + PIL.
"""

from __future__ import annotations

import numpy as np


def two_channel_to_tiles(sample: np.ndarray) -> np.ndarray:
    """(B, 2, H, W) -> (2B, 3, H, W): channel-major grayscale tiles, exactly
    the reference's transpose/reshape/cat (e.g. kitti runner :848-851).
    RGB batches (CIFAR10/CELEBA via ncsn_original.yml) pass through and
    single-channel batches (lidar.yml) are replicated to grayscale RGB, as
    torchvision's ``save_image`` renders them."""
    assert sample.ndim == 4 and sample.shape[1] in (1, 2, 3)
    b, c, h, w = sample.shape
    if c == 3:
        return sample
    t = np.transpose(sample, (1, 0, 2, 3)).reshape(c * b, 1, h, w)
    return np.concatenate([t, t, t], axis=1)


def make_grid(images: np.ndarray, nrow: int, padding: int = 2) -> np.ndarray:
    """torchvision-style grid: (N, 3, H, W) -> (3, H', W') float in [0,1]."""
    n, c, h, w = images.shape
    nrow = max(1, int(nrow))
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros((c, ncol * (h + padding) + padding, nrow * (w + padding) + padding))
    for i in range(n):
        r, col = i // nrow, i % nrow
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[:, y : y + h, x : x + w] = images[i]
    return grid


def save_image(grid: np.ndarray, path: str) -> None:
    from PIL import Image

    arr = np.clip(np.transpose(grid, (1, 2, 0)), 0.0, 1.0)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def save_sample_grid(sample: np.ndarray, path: str, nrow: int) -> None:
    save_image(make_grid(two_channel_to_tiles(sample), nrow), path)
