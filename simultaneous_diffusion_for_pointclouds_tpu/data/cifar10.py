"""CIFAR-10 batches for the legacy NCSNv2 image path (ncsn_original.yml).

The reference loads CIFAR10 via torchvision with ``ToTensor`` (+ random
horizontal flip on train) and routes it to the plain NCSN runner
(reference runners/ncsn_runner.py:26-33 dispatches CIFAR10/CELEBA to
NCSNv2; datasets/__init__.py builds the torchvision dataset).  This
module reads the standard "CIFAR-10 python" pickle batches directly from
``data.root`` — no torchvision / no network — and serves the same item
schema as the LiDAR datasets (``real``/``known``/``sky``) so the base
trainer, plain sampler and fast_fid drive it unchanged.

Uniform dequantization (``data.uniform_dequantization: true`` in the
reference config) stays in :func:`..data.transforms.data_transform`,
applied per batch by the runners exactly like the reference applies it in
its runner-side ``data_transform``.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict

import numpy as np

from ..config import cfg_get

_TRAIN_FILES = [f"data_batch_{i}" for i in range(1, 6)]
_TEST_FILES = ["test_batch"]


def _find_batch_dir(root: str) -> str:
    for cand in (root, os.path.join(root, "cifar-10-batches-py")):
        if os.path.isfile(os.path.join(cand, "test_batch")):
            return cand
    raise FileNotFoundError(
        f"no CIFAR-10 python batches under {root!r} (expected "
        "data_batch_1..5 + test_batch, optionally inside "
        "cifar-10-batches-py/); download the 'CIFAR-10 python version' "
        "archive and point data.root at it"
    )


class CIFAR10:
    """dataset: "CIFAR10" — 3x32x32 images in [0, 1]."""

    def __init__(self, config, split: str = "train"):
        root = cfg_get(config, "data.root", "/data/cifar10")
        base = _find_batch_dir(root)
        names = _TRAIN_FILES if split == "train" else _TEST_FILES
        chunks = []
        for name in names:
            with open(os.path.join(base, name), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            chunks.append(np.asarray(d[b"data"], np.uint8))
        self.images = np.concatenate(chunks).reshape(-1, 3, 32, 32)
        self.random_flip = split == "train" and cfg_get(
            config, "data.random_flip", False
        )

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        real = self.images[idx].astype(np.float32) / 255.0
        if self.random_flip and np.random.rand() < 0.5:
            real = real[:, :, ::-1].copy()
        # every pixel is trusted / no sky channel for camera images; the
        # ones keep the item schema uniform with the LiDAR datasets
        ones = np.ones((1,) + real.shape[1:], np.float32)
        return dict(
            real=real,
            known=np.ones_like(real),
            sky=ones,
            index=np.zeros((1,) + real.shape[1:], np.int64),
        )
