#!/bin/bash
# Round-4 eval resume: the phase-A flagship ablation died with its parent
# session after variant 3.  Re-run variants 4..6 into the SAME image folder
# (sampling.plan_start=4 + --keep_image_folder keep rng stream and doThis
# numbering identical to a full run), then the phase-A metrics and all of
# phase B.  ONE TPU client at a time (PERF_NOTES concurrent-client wedge).
set -x
cd /root/repo
mkdir -p bench_artifacts

# 1. flagship variants 4..6 (joint keep=6, joint keep=7, baseline)
python main.py --sample --ni --keep_image_folder --config flagship_eval_resume.yml \
  --doc flagship -i flagship_r04 --max_batches 1 \
  >> bench_artifacts/r04_flagship_run.log 2>&1

# 2. MAE vs GT + classical baselines, generated-pixels-only and all-pixels
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/flagship_r04 --batch 42 --views 7 \
  --mask generated_only --out bench_artifacts/flagship_r04_metrics.json \
  > bench_artifacts/r04_metrics.log 2>&1
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/flagship_r04 --batch 42 --views 7 \
  --out bench_artifacts/flagship_r04_metrics_all.json \
  >> bench_artifacts/r04_metrics.log 2>&1

echo "ROUND4 RESUME PHASE A DONE"

# 3. phase B: corrected --test sweep, fast_fid, bf16-vs-f32 pair
bash tools/round4_eval_b.sh
echo "ROUND4 RESUME ALL DONE"
