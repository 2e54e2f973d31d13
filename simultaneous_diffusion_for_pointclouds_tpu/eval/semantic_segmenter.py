"""Semantic-segmentation evaluation driver.

Port of ``MeasureResults/SemanticSegmenter.py``: for each experiment tree
(``GroundTruth/ Simultaneous/ LiDARGen/`` with ``Organised/k_*/`` scans),
run RangeNet++ inference over the organised range images and compute IoU of
generated-vs-GT label maps.

RangeNet++ itself is an external dependency (the reference expects a
checkout under ``rangenetpp/lidar_bonnetal_master``; it is not vendored
there either).  This driver shells out to a configurable command per scan
folder, or consumes precomputed predictions saved as
``result_rangenet_segmentations/<n>.{pth,npy}``, then evaluates with
:mod:`iou`.

    python -m simultaneous_diffusion_for_pointclouds_tpu.eval.semantic_segmenter \
        --exp_root DGXData/Line --pred_cmd "python infer.py {src} {dst}"
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess

import numpy as np

from .iou import evaluate_folders, map_labels


def _load_prediction(path: str) -> np.ndarray:
    if path.endswith(".pth"):
        import torch

        return torch.load(path, map_location="cpu").numpy()
    return np.load(path)


def _infer(organised_dir: str, pred_cmd: str | None):
    """Resolve (or produce) per-view predictions for one Organised/ tree.

    Returns a ``predictions/`` dir mirroring the ``k_<view>/<n>.npy`` layout
    that :func:`iou.evaluate_folders` walks.  Precomputed RangeNet++ outputs
    are consumed from each view folder's ``result_rangenet_segmentations/``
    (``target_rangenet_segmentations/`` for GroundTruth trees), exactly
    where the reference's SemanticSegmenter.py:28-49 writes/reads them.
    """
    pred_dir = os.path.join(organised_dir, "predictions")
    if os.path.isdir(pred_dir):
        return pred_dir
    if pred_cmd:
        os.makedirs(pred_dir, exist_ok=True)
        subprocess.run(
            pred_cmd.format(src=organised_dir, dst=pred_dir), shell=True, check=True
        )
        return pred_dir
    # precomputed per-scan predictions inside each k_* view folder
    found = False
    for k_dir in sorted(glob.glob(os.path.join(organised_dir, "k_*"))):
        for seg_name in ("result_rangenet_segmentations",
                         "target_rangenet_segmentations"):
            alt = os.path.join(k_dir, seg_name)
            if not os.path.isdir(alt):
                continue
            out_k = os.path.join(pred_dir, os.path.basename(k_dir))
            os.makedirs(out_k, exist_ok=True)
            for path in glob.glob(os.path.join(alt, "*")):
                name = os.path.basename(path).rsplit(".", 1)[0]
                labels = _load_prediction(path)
                np.save(os.path.join(out_k, name + ".npy"), map_labels(labels))
            found = True
    return pred_dir if found else None


def evaluate_experiment(exp_root: str, pred_cmd: str | None = None):
    """IoU of Simultaneous and LiDARGen trees against GroundTruth."""
    gt = _infer(os.path.join(exp_root, "GroundTruth", "Organised"), pred_cmd)
    results = {}
    for method in ("Simultaneous", "LiDARGen"):
        pred = _infer(os.path.join(exp_root, method, "Organised"), pred_cmd)
        if gt and pred:
            results[method] = evaluate_folders(pred, gt)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp_root", required=True)
    p.add_argument("--pred_cmd", default=None,
                   help="shell template with {src}/{dst} to run RangeNet++")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    results = evaluate_experiment(args.exp_root, args.pred_cmd)
    text = json.dumps(results, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
