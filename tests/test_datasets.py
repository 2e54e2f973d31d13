import argparse

import numpy as np

from simultaneous_diffusion_for_pointclouds_tpu.data.loader import (
    BatchLoader,
    SceneBlockSampler,
)
from simultaneous_diffusion_for_pointclouds_tpu.data.synthetic import (
    SyntheticAllForOne,
    SyntheticScenes,
)


def _config(views=3, h=16, w=64):
    ns = argparse.Namespace
    return ns(
        data=ns(
            dataset="synthetic",
            image_size=h,
            image_width=w,
            channels=2,
            random_roll=False,
            modifications=[[0, 0, 0], [5, -5, 0], [-5, -5, 0]],
            synthetic_frames=12,
            synthetic_points=8000,
        ),
        sampling=ns(actualBatchSize=views),
    )


def test_synthetic_line_dataset_items():
    ds = SyntheticScenes(_config())
    assert len(ds) == 12 * 3
    item = ds[0]
    assert item["real"].shape == (2, 16, 64)
    assert item["known"].shape == (2, 16, 64)
    assert item["sky"].shape == (1, 16, 64)
    assert item["to_world"].shape == (4, 4)
    assert 0.0 <= item["real"].min() and item["real"].max() <= 1.0
    # known=1 marks trusted pixels; there must be plenty of both
    frac = item["known"].mean()
    assert 0.05 < frac < 0.999
    # to_world @ from_world == I
    np.testing.assert_allclose(
        item["to_world"] @ item["from_world"], np.eye(4), atol=1e-4
    )


def test_all_for_one_uses_offset_origins():
    ds = SyntheticAllForOne(_config())
    a = ds[0]  # view 0, origin [0,0,0]
    b = ds[1]  # view 1, origin [5,-5,0]
    assert not np.allclose(a["real"], b["real"])


def test_scene_block_sampler_contiguous():
    s = SceneBlockSampler(num_scenes=4, views_per_scene=3, shuffle=True, seed=0)
    idx = list(s)
    assert len(idx) == 12
    for i in range(0, 12, 3):
        block = idx[i : i + 3]
        assert block[0] % 3 == 0
        assert block == [block[0], block[0] + 1, block[0] + 2]


def test_batch_loader_scene_batches():
    cfg = _config()
    ds = SyntheticScenes(cfg)
    sampler = SceneBlockSampler(12, 3, shuffle=True, seed=1)
    loader = BatchLoader(ds, batch_size=6, sampler=sampler, num_workers=2)
    batches = list(loader)
    assert len(batches) == 6
    b = batches[0]
    assert b["real"].shape == (6, 2, 16, 64)
    assert b["to_world"].shape == (6, 4, 4)
