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


# ---------------------------------------------------------------------------
# Real KITTI-360 directory layout: no real data exists in this environment,
# so fabricate the reference's on-disk tree (calibration/, data_poses/<drive>/
# poses.txt, data_3d_raw/<drive>/velodyne_points/data/*.bin — see
# kitti360_im_8Batch.py:49-68,309-315) and drive the REAL glob/path logic
# (scan_provider=None) end to end.
def _fake_kitti360_tree(root, n_frames=12, prefixed_calib=False):
    import os

    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "calibration"))
    drive = "2013_05_28_drive_0000_sync"
    velo_dir = os.path.join(root, "data_3d_raw", drive, "velodyne_points", "data")
    pose_dir = os.path.join(root, "data_poses", drive)
    os.makedirs(velo_dir)
    os.makedirs(pose_dir)

    cam_to_velo = np.hstack([np.eye(3), np.array([[0.3], [0.1], [-0.2]])])
    np.savetxt(os.path.join(root, "calibration", "calib_cam_to_velo.txt"),
               cam_to_velo.reshape(1, 12))
    cam_to_pose = np.hstack([np.eye(3), np.array([[0.1], [0.0], [0.5]])])
    calib_path = os.path.join(root, "calibration", "calib_cam_to_pose.txt")
    rows = [cam_to_pose.reshape(12), (cam_to_pose + 0.01).reshape(12)]
    if prefixed_calib:
        # the real KITTI-360 distribution labels each row ("image_00: ...")
        with open(calib_path, "w") as f:
            for name, row in zip(["image_00", "image_01"], rows):
                f.write(name + ": " + " ".join(f"{v:.9f}" for v in row) + "\n")
    else:
        np.savetxt(calib_path, np.stack(rows))

    pose_rows = []
    for i in range(n_frames):
        mat = np.hstack([np.eye(3), np.array([[2.0 * i], [0.0], [0.0]])])
        pose_rows.append(np.concatenate([[i + 1], mat.reshape(12)]))
        scan = rng.randn(500, 4).astype(np.float32)
        scan[:, :3] *= 10.0
        scan[:, 3] = rng.rand(500) * 0.9
        scan.tofile(os.path.join(velo_dir, f"{i:010d}.bin"))
    np.savetxt(os.path.join(pose_dir, "poses.txt"), np.stack(pose_rows))


def _real_layout_config(root, views=2, h=8, w=16):
    ns = argparse.Namespace
    return ns(
        data=ns(dataset="KITTI360_im_8batch", image_size=h, image_width=w,
                channels=2, random_roll=False, root=str(root),
                modifications=[[0, 0, 0], [5, -5, 0]]),
        sampling=ns(actualBatchSize=views),
    )


def test_kitti360_real_layout_roundtrip(tmp_path):
    from simultaneous_diffusion_for_pointclouds_tpu.data.kitti360 import (
        KITTI360Im8Batch,
    )

    for prefixed in (False, True):
        root = tmp_path / ("prefixed" if prefixed else "stripped")
        _fake_kitti360_tree(str(root), n_frames=12, prefixed_calib=prefixed)
        ds = KITTI360Im8Batch(_real_layout_config(root))
        assert len(ds) == 12 * 2
        for idx in (0, 1, len(ds) - 1):
            item = ds[idx]
            assert item["real"].shape == (2, 8, 16)
            assert np.isfinite(item["real"]).all()
            assert item["to_world"].shape == (4, 4)
            assert np.isfinite(item["to_world"]).all()
        # both calibration formats must produce identical pose chains
    from simultaneous_diffusion_for_pointclouds_tpu.data.pose import load_velo_to_pose

    a = load_velo_to_pose(str(tmp_path / "stripped"))
    b = load_velo_to_pose(str(tmp_path / "prefixed"))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# World consistency of the synthetic provider (round 4): scans of nearby
# frames must be observations of ONE world cloud, so the novel-view input
# (old scan warped to the target pose) agrees with the GT captured there —
# the overlap the cross-view consistency merge exploits.


def test_synthetic_provider_world_consistency():
    from simultaneous_diffusion_for_pointclouds_tpu.data.synthetic import (
        SyntheticScanProvider,
    )

    p = SyntheticScanProvider(num_frames=48, n_points=4000, seed=3)
    _, table = p.poses()
    world = []
    for f in (0, 5, 35):
        local = p.scan(f)
        h = np.concatenate([local[:, :3].T, np.ones((1, len(local)))], axis=0)
        world.append((table[float(f)] @ h)[:3].T)
    # every frame's scan, mapped to world, must lie inside the group cloud:
    # nearest-neighbour distance to frame 0's world points stays small for
    # the shared 85% (same points), never the ~uncorrelated-cloud scale
    a, b = world[0], world[2]
    # coarse NN via grid hashing (4000 pts, exact would be O(n^2)=16M: fine)
    d2 = ((a[:, None, :2] - b[None, :, :2]) ** 2).sum(-1)
    nn = np.sqrt(d2.min(1))
    assert np.median(nn) < 0.5  # shared world geometry
    # and the z values live on the same structures
    assert abs(np.median(a[:, 2]) - np.median(b[:, 2])) < 0.2


def test_synthetic_line_input_agrees_with_goal():
    """Nonzero input pixels of a Line item must mostly agree with GT at the
    same pixel (same world; differences only from occlusion/subsampling)."""
    ds = SyntheticScenes(_config(views=3, h=32, w=256))
    item = ds[2]  # view 2 of scene 0: warp of +15 poses
    real, goal = item["real"][0], item["goal"][0]
    both = (real > 0.001) & (goal > 0.001)
    assert both.mean() > 0.05
    agree = np.abs(real[both] - goal[both])
    # most overlapping returns see the same surface (log-range units)
    assert np.median(agree) < 0.03
