#!/bin/bash
# Round-4 eval phase B: corrected --test sweep, fast_fid with the trained
# checkpoint, bf16-vs-f32 sampling evidence pair. ONE TPU client at a time.
set -x
cd /root/repo
mkdir -p bench_artifacts

# 1. corrected checkpoint sweep (curriculum-replay test loss)
python main.py --test --config flagship_train.yml --doc flagship_train \
  > bench_artifacts/r04_test_sweep.log 2>&1

# 2. fast_fid distribution metrics with the trained EMA weights
python main.py --fast_fid --ni --config flagship_train.yml --doc flagship \
  -i fastfid_r04 --ckpt exp/logs/flagship_train/ckpt \
  > bench_artifacts/r04_fastfid.log 2>&1
cp exp/fid_samples/fastfid_r04/fid_metrics.json \
  bench_artifacts/r04_fid_metrics.json 2>/dev/null

# 3. bf16 vs f32 joint sampling (21-image north-star shape, joint_only)
python main.py --sample --ni --config bf16_eval_f32.yml --doc flagship \
  -i bf16_f32_r04 --max_batches 1 --ckpt exp/logs/flagship_train/ckpt \
  > bench_artifacts/r04_bf16_f32_run.log 2>&1
python main.py --sample --ni --config bf16_eval_bf16.yml --doc flagship \
  -i bf16_bf16_r04 --max_batches 1 --ckpt exp/logs/flagship_train/ckpt \
  > bench_artifacts/r04_bf16_bf16_run.log 2>&1
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/bf16_f32_r04 --batch 21 --views 7 \
  --mask generated_only --no_classical \
  --out bench_artifacts/r04_bf16_f32_metrics.json > /dev/null 2>&1
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/bf16_bf16_r04 --batch 21 --views 7 \
  --mask generated_only --no_classical \
  --out bench_artifacts/r04_bf16_bf16_metrics.json > /dev/null 2>&1

echo "ROUND4 EVAL PHASE B DONE"
