"""Scripted evaluation of sampling runs: per-view MAE vs ground truth and
classical baselines.

Port of the reference's de-facto acceptance tests, the
``MeasureResults/QuantifyingNotebook*.ipynb`` notebooks (cells 1-6):

- For each batch's output files (``{k}_{ids}_Masked_completion_*.pth.npy``),
  unlog range (``2^(6x)-1`` metres) and compute the mean absolute error vs
  GT per ablation setting (doThis) and per view index k within a scene.
- Classical baselines from the same inputs: cv2 Navier-Stokes inpainting of
  the masked input, and INTER_NEAREST / LINEAR / CUBIC 4x row-upsampling of
  every 4th GT row (the notebook's densification baselines).
- Wall-clock per variant from ``*_TimeTaken.npy``.

Outputs one JSON report.  Usage:
    python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
        --image_folder exp/image_samples/images --batch 42 --views 7
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
from collections import defaultdict

import numpy as np


def _unlog(x):
    return np.power(2.0, x * 6.0) - 1.0


def _load_grid_npy(path, batch, h, w):
    """(2B, 3, H, W) tile layout -> (2B, H, W) first channel."""
    arr = np.load(path)
    return arr[:, 0].reshape(2 * batch, h, w)


def _classical_baselines(input_dist, input_int, gt_dist, gt_int):
    """cv2 baselines for one view image (notebook cell 1)."""
    import cv2

    ignore = 0.1
    out = {}
    ns_d = cv2.inpaint(
        input_dist.astype(np.float32),
        (input_dist <= ignore).astype(np.uint8), 3, flags=0,
    )
    ns_i = cv2.inpaint(
        input_int.astype(np.float32),
        (input_int <= ignore).astype(np.uint8), 3, flags=0,
    )
    out["NS"] = (ns_d, ns_i)
    # the Synthesis notebook's inpainting baseline is cv2.INPAINT_TELEA
    # (QuantifyingNotebookSynthesis.ipynb cell 1); NS kept alongside as the
    # stronger-in-practice classical comparison
    te_d = cv2.inpaint(
        input_dist.astype(np.float32),
        (input_dist <= ignore).astype(np.uint8), 3, flags=1,
    )
    te_i = cv2.inpaint(
        input_int.astype(np.float32),
        (input_int <= ignore).astype(np.uint8), 3, flags=1,
    )
    out["TELEA"] = (te_d, te_i)
    for name, flag in (
        ("INTER_NEAREST", cv2.INTER_NEAREST),
        ("INTER_LINEAR", cv2.INTER_LINEAR),
        ("INTER_CUBIC", cv2.INTER_CUBIC),
    ):
        up_d = cv2.resize(gt_dist[0::4].astype(np.float32), (0, 0), fx=1.0, fy=4.0, interpolation=flag)
        up_i = cv2.resize(gt_int[0::4].astype(np.float32), (0, 0), fx=1.0, fy=4.0, interpolation=flag)
        out[name] = (up_d[: gt_dist.shape[0]], up_i[: gt_int.shape[0]])
    return out


def evaluate_run(
    image_folder: str,
    batch: int = 42,
    views: int = 7,
    h: int = 64,
    w: int = 1024,
    ckpt_id: int | str = "*",
    mask_mode: str = "all",
    with_classical: bool = True,
):
    """Returns a nested dict of MAE metrics per setting and view index."""
    gt_files = sorted(glob.glob(os.path.join(image_folder, f"0_*_GT_completion_{ckpt_id}.pth.npy")))
    groups = batch // views

    dist_err = defaultdict(lambda: np.zeros(views))
    int_err = defaultdict(lambda: np.zeros(views))
    pixels = np.zeros(views)
    classical_err = defaultdict(lambda: np.zeros(views))
    classical_int_err = defaultdict(lambda: np.zeros(views))
    time_taken = {}

    n_batches = 0
    for gt_path in gt_files:
        stem = os.path.basename(gt_path)
        m = re.match(r"0_(.*)_GT_completion_(.*)\.pth\.npy", stem)
        if not m:
            continue
        ids, ck = m.groups()
        input_path = os.path.join(image_folder, f"0_{ids}_Input_completion_{ck}.pth.npy")
        if not os.path.isfile(input_path):
            continue
        gt = _load_grid_npy(gt_path, batch, h, w)
        inp = _load_grid_npy(input_path, batch, h, w)
        gt_dist = _unlog(gt[:batch])
        gt_int = gt[batch:]
        in_dist_log = inp[:batch]
        in_int = inp[batch:]
        in_dist = _unlog(in_dist_log.astype(np.float32))

        if mask_mode == "generated_only":
            mask = np.logical_and(in_dist_log <= 0.001, gt_dist > 0.1)
        else:
            mask = np.ones_like(gt_dist, dtype=bool)

        n_batches += 1
        for g in range(groups):
            for k in range(views):
                s = g * views + k
                pixels[k] += mask[s].sum()

        # model outputs per ablation setting
        for setting in range(views):
            out_path = os.path.join(
                image_folder, f"{setting}_{ids}_Masked_completion_{ck}.pth.npy"
            )
            if not os.path.isfile(out_path):
                continue
            arr = np.load(out_path)
            nb = arr.shape[0] // 2
            out = arr[:, 0].reshape(2 * nb, h, w)
            out_views = nb // groups  # views kept in this ablation
            out_dist = _unlog(out[:nb])
            out_int = out[nb:]
            for g in range(groups):
                for k in range(out_views):
                    so = g * out_views + k
                    sg = g * views + k
                    mk = mask[sg]
                    dist_err[setting][k] += np.abs(out_dist[so] - gt_dist[sg])[mk].sum()
                    int_err[setting][k] += np.abs(out_int[so] - gt_int[sg])[mk].sum()

            tt = glob.glob(os.path.join(image_folder, f"{setting}_{ids}_TimeTaken.npy"))
            if tt:
                time_taken[str(setting)] = float(np.load(tt[0]))

        if with_classical:
            for g in range(groups):
                for k in range(views):
                    s = g * views + k
                    mk = mask[s]
                    base = _classical_baselines(in_dist[s], in_int[s], gt_dist[s], gt_int[s])
                    for name, (bd, bi) in base.items():
                        classical_err[name][k] += np.abs(bd - gt_dist[s])[mk].sum()
                        classical_int_err[name][k] += np.abs(bi - gt_int[s])[mk].sum()

    denom = pixels + 1e-6
    report = {
        "batches": n_batches,
        "pixels_per_view": pixels.tolist(),
        "mae_range_m": {
            str(s): (dist_err[s] / denom).tolist() for s in sorted(dist_err)
        },
        "mae_intensity": {
            str(s): (int_err[s] / denom).tolist() for s in sorted(int_err)
        },
        "classical_mae_range_m": {
            k: (v / denom).tolist() for k, v in classical_err.items()
        },
        "classical_mae_intensity": {
            k: (v / denom).tolist() for k, v in classical_int_err.items()
        },
        "time_taken_s": time_taken,
    }
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_folder", required=True)
    p.add_argument("--batch", type=int, default=42)
    p.add_argument("--views", type=int, default=7)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--mask", choices=["all", "generated_only"], default="all")
    p.add_argument("--no_classical", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    report = evaluate_run(
        args.image_folder, args.batch, args.views, args.height, args.width,
        mask_mode=args.mask, with_classical=not args.no_classical,
    )
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
