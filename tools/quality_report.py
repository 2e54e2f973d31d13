"""Summarise a flagship ablation's metrics JSON into the round-4 quality
verdict: does JOINT simultaneous sampling beat the per-view inpainting
BASELINE and the classical cv2 baselines on held-out scenes?

Input: the eval/metrics.py report (mask_mode=generated_only recommended —
the notebook convention: pixels with no input return but real GT).
For the poses plan with A views, doThis A-2 is the full-joint variant and
doThis A-1 the plain per-view inpainting baseline (runners/sample.py
_ablation_plan; reference ncsn_runner_kitti_simultaneous.py:707-758).

    python tools/quality_report.py bench_artifacts/flagship_r04_metrics.json --views 7
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def summarise(report: dict, views: int) -> dict:
    joint_key, base_key = str(views - 2), str(views - 1)
    mae = report["mae_range_m"]
    out = {"views": views}
    if joint_key not in mae or base_key not in mae:
        out["error"] = f"missing settings {joint_key}/{base_key} in {sorted(mae)}"
        return out
    joint = np.asarray(mae[joint_key][:views])
    base = np.asarray(mae[base_key][:views])
    classical = {
        k: float(np.mean(v[:views])) for k, v in report["classical_mae_range_m"].items()
    }
    out.update(
        joint_mae_m=float(joint.mean()),
        baseline_mae_m=float(base.mean()),
        joint_per_view=joint.round(4).tolist(),
        baseline_per_view=base.round(4).tolist(),
        classical_mae_m={k: round(v, 4) for k, v in classical.items()},
        joint_beats_baseline=bool(joint.mean() < base.mean()),
        joint_beats_baseline_per_view=int((joint < base).sum()),
        joint_beats_classical={
            k: bool(joint.mean() < v) for k, v in classical.items()
        },
        # progressive ablation: more views -> lower MAE?  Joint setting s
        # keeps min(s+2, views) views; absent views are zero-filled in the
        # metrics report and must not dilute the mean.
        progression={
            s: float(np.mean(np.asarray(v)[: min(int(s) + 2, views)]))
            for s, v in sorted(mae.items(), key=lambda kv: int(kv[0]))
        },
        time_taken_s=report.get("time_taken_s", {}),
    )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metrics_json")
    p.add_argument("--views", type=int, default=7)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    report = json.load(open(args.metrics_json))
    summary = summarise(report, args.views)
    text = json.dumps(summary, indent=2)
    print(text)
    if args.out:
        open(args.out, "w").write(text)


if __name__ == "__main__":
    main()
