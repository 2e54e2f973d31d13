import os
import subprocess
import sys

import numpy as np
import pytest

from simultaneous_diffusion_for_pointclouds_tpu.data.subsampling import (
    _numpy_grid_subsample,
    grid_sub_sampling,
)

NATIVE_DIR = os.path.join(
    os.path.dirname(__file__), "..",
    "simultaneous_diffusion_for_pointclouds_tpu", "native",
)


def _ensure_native_built():
    import glob

    if glob.glob(os.path.join(NATIVE_DIR, "grid_subsampling*.so")):
        return True
    r = subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=NATIVE_DIR, capture_output=True,
    )
    return r.returncode == 0


def test_numpy_subsample_barycenters():
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [1.1, 1.1, 1.1]], np.float32)
    sub, _, _ = _numpy_grid_subsample(pts, None, None, 1.0)
    assert sub.shape == (2, 3)
    merged = sub[np.argsort(sub[:, 0])]
    np.testing.assert_allclose(merged[0], [0.2, 0.2, 0.2], atol=1e-6)
    np.testing.assert_allclose(merged[1], [1.1, 1.1, 1.1], atol=1e-6)


@pytest.mark.skipif(not _ensure_native_built(), reason="native build failed")
def test_native_matches_numpy_fallback():
    sys.path.insert(0, os.path.abspath(NATIVE_DIR))
    import grid_subsampling

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 5, (20000, 3)).astype(np.float32)
    feats = rng.uniform(0, 1, (20000, 2)).astype(np.float32)
    native_p, native_f = grid_subsampling.compute(pts, features=feats, sampleDl=0.5)
    np_p, np_f, _ = _numpy_grid_subsample(pts, feats, None, 0.5)
    assert native_p.shape == np_p.shape
    # voxel output order differs (hash map vs sorted unique): compare sorted
    order_n = np.lexsort(native_p.T)
    order_m = np.lexsort(np_p.T)
    np.testing.assert_allclose(native_p[order_n], np_p[order_m], atol=1e-4)
    np.testing.assert_allclose(native_f[order_n], np_f[order_m], atol=1e-4)


def test_grid_sub_sampling_wrapper_arity():
    pts = np.random.default_rng(1).uniform(0, 2, (500, 3)).astype(np.float32)
    only_p = grid_sub_sampling(pts, sampleDl=0.5)
    p = only_p[0] if isinstance(only_p, tuple) else only_p
    assert p.shape[1] == 3


def test_organise_layout(tmp_path):
    from simultaneous_diffusion_for_pointclouds_tpu.eval.organise import organise

    src = tmp_path / "src"
    src.mkdir()
    groups, views, h, w = 2, 3, 8, 16
    b = groups * views
    arr = np.random.default_rng(0).uniform(size=(2 * b, h, w)).astype(np.float32)
    np.save(src / "0_run_Masked_completion_0.pth.npy", arr)
    dst = organise(str(src), str(tmp_path / "org"), groups=groups)
    import glob as g

    kdirs = sorted(g.glob(os.path.join(dst, "k_*")))
    assert len(kdirs) == views
    sample = np.load(os.path.join(kdirs[0], "0.npy"))
    assert sample.shape == (2, h, w)


def test_metrics_on_fabricated_run(tmp_path):
    from simultaneous_diffusion_for_pointclouds_tpu.eval.metrics import evaluate_run
    from simultaneous_diffusion_for_pointclouds_tpu.utils.images import (
        two_channel_to_tiles,
    )

    batch, views, h, w = 6, 3, 8, 16
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.1, 0.9, (batch, 2, h, w)).astype(np.float32)
    np.save(tmp_path / "0_1_2__GT_completion_0.pth.npy", two_channel_to_tiles(gt))
    np.save(tmp_path / "0_1_2__Input_completion_0.pth.npy", two_channel_to_tiles(gt * 0.5))
    # a perfect output for setting 0 -> zero error
    np.save(tmp_path / "0_1_2__Masked_completion_0.pth.npy", two_channel_to_tiles(gt))
    np.save(tmp_path / "0_1_2__TimeTaken.npy", np.float64(1.5))

    report = evaluate_run(
        str(tmp_path), batch=batch, views=views, h=h, w=w, ckpt_id=0,
        with_classical=False,
    )
    assert report["batches"] == 1
    np.testing.assert_allclose(report["mae_range_m"]["0"], 0.0, atol=1e-5)
    assert report["time_taken_s"]["0"] == 1.5


def test_visualization_smoke(tmp_path):
    from simultaneous_diffusion_for_pointclouds_tpu.eval.visualization import (
        range_image_to_points,
        visualize_tensor,
    )

    img = np.random.default_rng(0).uniform(0.2, 0.8, (2, 8, 32)).astype(np.float32)
    pts = range_image_to_points(img[0], img[1])
    assert pts.shape[1] == 4 and len(pts) > 0
    paths = visualize_tensor(img, str(tmp_path))
    for bev, persp in paths:
        assert os.path.isfile(bev) and os.path.isfile(persp)


def test_scene_completer_roundtrip(tmp_path):
    """complete_scene on a fabricated organised run: one generated view +
    raw scan -> Final cloud with xyz shifted by the view origin and the
    median re-centering undone (MeasureResults/SceneCompleter.py:60-269)."""
    from simultaneous_diffusion_for_pointclouds_tpu.eval.scene_completer import (
        complete_scene,
    )

    rng = np.random.default_rng(0)
    rows, cols = 16, 64
    raw = np.concatenate(
        [rng.uniform(-20, 20, (500, 3)), rng.uniform(0, 1, (500, 1))], axis=1
    ).astype(np.float32)
    raw_path = tmp_path / "scan.npy"
    np.save(raw_path, raw)

    views = tmp_path / "views"
    (views / "Origins").mkdir(parents=True)
    # log-compressed distances ~ 2-40 m everywhere: nothing below the 1.5 m
    # trust floor, so only the sky heuristic filters points
    dist = np.log2(1.0 + rng.uniform(2.0, 40.0, (rows, cols))) / 6.0
    arr = np.zeros((2, 3, rows, cols), np.float32)
    arr[0, 0] = dist
    np.save(views / "0.npy", arr.astype(np.float32))
    np.save(views / "Origins" / "0.npy", np.asarray([5.0, -3.0, 0.0]))

    out = tmp_path / "Final" / "scan.npy"
    final = complete_scene(
        str(views), str(raw_path), str(out), rows=rows, cols=cols
    )
    assert out.is_file()
    assert final.ndim == 2 and final.shape[1] == 4
    assert 0 < len(final) <= rows * cols
    assert np.all(final[:, 3] == 0)  # no RangeNet labels provided
    assert np.isfinite(final).all()
