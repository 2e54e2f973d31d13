#!/bin/bash
# Round-5 eval from the polished checkpoint (ckpt_268, true_step 38001):
# 1. joint (setting 5) vs per-view baseline (setting 6) flagship ablation
# 2. MAE metrics + quality report (joint vs baseline vs classical cv2)
# 3. fast_fid distribution metrics (JSD/MMD^2 target < r04's 0.323)
# 4. checkpoint test sweep (curriculum-replay test loss curve)
# Launch DETACHED (setsid nohup); ONE TPU client at a time throughout.
set -x
cd /root/repo
mkdir -p bench_artifacts
CKPT=exp/logs/flagship_train/ckpt_268

# joint (setting 5) vs per-view baseline (setting 6) at the flagship shape
python main.py --sample --ni --config flagship_eval_jb.yml --doc flagship \
  -i flagship_r05 --max_batches 1 --ckpt "$CKPT" \
  > bench_artifacts/r05_jb_run.log 2>&1
echo "JB ABLATION DONE rc=$?"
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/flagship_r05 --batch 42 --views 7 \
  --mask generated_only --out bench_artifacts/flagship_r05_metrics.json \
  > bench_artifacts/r05_metrics.log 2>&1
python tools/quality_report.py bench_artifacts/flagship_r05_metrics.json \
  --views 7 --out bench_artifacts/flagship_r05_summary.json \
  >> bench_artifacts/r05_metrics.log 2>&1
echo "METRICS DONE"

# fast_fid with the polished EMA weights
python main.py --fast_fid --ni --config flagship_train.yml --doc flagship \
  -i fastfid_r05 --ckpt "$CKPT" \
  > bench_artifacts/r05_fastfid.log 2>&1
cp exp/fid_samples/fastfid_r05/fid_metrics.json \
  bench_artifacts/r05_fid_metrics.json 2>/dev/null
echo "FASTFID DONE"

# checkpoint sweep: test loss across snapshots (convergence evidence)
python main.py --test --config flagship_train.yml --doc flagship_train \
  > bench_artifacts/r05_test_sweep.log 2>&1
echo "ROUND5 EVAL DONE"
