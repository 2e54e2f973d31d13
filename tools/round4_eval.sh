#!/bin/bash
# Round-4 post-training evaluation sequence (VERDICT r3 #1/#2/#8):
# run AFTER the training process exits — the chip serves ONE client at a
# time (PERF_NOTES concurrent-client wedge note).
set -x
cd /root/repo
mkdir -p bench_artifacts

# 1. checkpoint DSM-loss sweep over every saved ckpt_{step}
python main.py --test --config flagship_train.yml --doc flagship_train \
  > bench_artifacts/r04_test_sweep.log 2>&1

# 2. flagship 42-image 7-variant ablation with the trained EMA weights,
#    per-segment timing + per-variant memory stats (slowdown diagnosis)
python main.py --sample --ni --config flagship_eval.yml --doc flagship \
  -i flagship_r04 --max_batches 1 > bench_artifacts/r04_flagship_run.log 2>&1

# 3. MAE vs GT + classical baselines, generated-pixels-only and all-pixels
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/flagship_r04 --batch 42 --views 7 \
  --mask generated_only --out bench_artifacts/flagship_r04_metrics.json \
  > /dev/null 2>&1
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/flagship_r04 --batch 42 --views 7 \
  --out bench_artifacts/flagship_r04_metrics_all.json > /dev/null 2>&1

echo "ROUND4 EVAL PHASE A DONE"
