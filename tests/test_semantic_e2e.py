"""End-to-end semantic/scene-completion eval pipeline (VERDICT r4 #6).

Fabricated RangeNet++-style predictions driven through the full reference
flow (MeasureResults/SemanticSegmenter.py:14-55 + SceneCompleter.py:60-269):
batched sampling outputs -> organise -> per-view segmentations ->
evaluate_experiment IoU JSON -> scene_completer Final/<scan>.npy.
"""

import json
import os

import numpy as np
import pytest

from simultaneous_diffusion_for_pointclouds_tpu.eval.iou import (
    RANGENET_TO_KITTI360,
    map_labels,
)
from simultaneous_diffusion_for_pointclouds_tpu.eval.organise import organise
from simultaneous_diffusion_for_pointclouds_tpu.eval.semantic_segmenter import (
    evaluate_experiment,
)

ROWS, COLS = 16, 64
GROUPS = 6  # scans per completion file, reference FileOrganiser default


def _completion_batch(rng, b):
    """(2B, 3, H, W): distance tiles then intensity tiles, like the
    sampling runners' *_completion_*.pth.npy grids."""
    arr = rng.uniform(0.05, 0.9, (2 * b, 3, ROWS, COLS)).astype(np.float32)
    return arr


def _labels_for(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 20, (ROWS, COLS), dtype=np.int64)


def _build_method_tree(root, method, batches, label_seed_off, torch_for_first):
    """Organised/k_*/ view tree + per-k result_rangenet_segmentations."""
    src = root / method / "raw"
    src.mkdir(parents=True)
    rng = np.random.default_rng(hash(method) % 2**31)
    for i, b in enumerate(batches):
        np.save(src / f"{i}_completion.npy", _completion_batch(rng, b))
    organised = root / method / "Organised"
    organise(str(src), str(organised), groups=GROUPS)
    seg_name = (
        "target_rangenet_segmentations"
        if method == "GroundTruth"
        else "result_rangenet_segmentations"
    )
    wrote_torch = False
    for k_dir in sorted(organised.glob("k_*")):
        seg = k_dir / seg_name
        seg.mkdir()
        for view in sorted(k_dir.glob("*.npy")):
            n = view.stem
            labels = _labels_for(label_seed_off + int(n) * 100 + int(k_dir.name[2:]))
            if torch_for_first and not wrote_torch:
                import torch

                torch.save(torch.from_numpy(labels), seg / f"{n}.pth")
                wrote_torch = True
            else:
                np.save(seg / f"{n}.npy", labels)
    return organised


@pytest.mark.slow
def test_semantic_pipeline_end_to_end(tmp_path):
    batches = [12, 12]  # two completion files x 12 scans -> k_0 / k_1 views
    # Simultaneous predictions == GT labels (perfect IoU); LiDARGen's are
    # shifted by one class id (degraded IoU)
    gt = _build_method_tree(tmp_path, "GroundTruth", batches, 0, False)
    sim = _build_method_tree(tmp_path, "Simultaneous", batches, 0, True)
    lg_root = tmp_path / "LiDARGen"
    _build_method_tree(tmp_path, "LiDARGen", batches, 0, False)
    # degrade LiDARGen: rotate every prediction's class ids
    for seg in (lg_root / "Organised").glob("k_*/result_rangenet_segmentations/*.npy"):
        np.save(seg, (np.load(seg) + 1) % 20)

    results = evaluate_experiment(str(tmp_path))
    out = tmp_path / "iou.json"
    out.write_text(json.dumps(results, indent=2))

    parsed = json.loads(out.read_text())
    assert set(parsed) == {"Simultaneous", "LiDARGen"}
    assert parsed["Simultaneous"]["miou"] == pytest.approx(1.0)
    assert parsed["LiDARGen"]["miou"] < 0.2
    assert len(parsed["Simultaneous"]["iou"]) == 50

    # predictions/ trees mirror the k_* layout with KITTI-360 ids
    pred0 = np.load(sim / "predictions" / "k_0" / "0.npy")
    assert pred0.shape == (ROWS, COLS)
    assert set(np.unique(pred0)) <= set(RANGENET_TO_KITTI360.values())
    gt0 = np.load(gt / "predictions" / "k_0" / "0.npy")
    np.testing.assert_array_equal(gt0, map_labels(_labels_for(0)))

    # ---- scene completion from the organised + labelled views ----
    from simultaneous_diffusion_for_pointclouds_tpu.eval.scene_completer import (
        complete_scene,
    )

    k0 = sim / "k_0"
    rng = np.random.default_rng(9)
    raw = np.concatenate(
        [rng.uniform(-20, 20, (400, 3)), rng.uniform(0, 1, (400, 1))], 1
    ).astype(np.float32)
    raw_path = tmp_path / "scan.npy"
    np.save(raw_path, raw)
    (k0 / "Origins").mkdir()
    for view in k0.glob("*.npy"):
        np.save(k0 / "Origins" / view.name, np.asarray([2.0, 1.0, 0.0]))

    final_path = tmp_path / "Final" / "scan.npy"
    final = complete_scene(
        str(k0), str(raw_path), str(final_path), rows=ROWS, cols=COLS
    )
    assert final_path.is_file()
    assert final.ndim == 2 and final.shape[1] == 4
    assert len(final) > 0 and np.isfinite(final).all()
    # labels flowed from result_rangenet_segmentations through the mapping
    assert set(np.unique(final[:, 3])) <= set(
        float(v) for v in RANGENET_TO_KITTI360.values()
    )
    assert np.unique(final[:, 3]).size > 1
