#!/bin/bash
# Round-4 master evaluation sequence with the fine-tuned EMA checkpoint
# (VERDICT r3 #1/#2/#4/#8), ordered by evidence priority so an early
# round end still leaves the headline artifacts.  Launch DETACHED
# (setsid nohup) so it survives the parent session; ONE TPU client at a
# time throughout (PERF_NOTES concurrent-client wedge).
set -x
cd /root/repo
mkdir -p bench_artifacts
CKPT=exp/logs/flagship_train/ckpt

# 2. flagship 42-image 7-variant ablation, trained weights, per-variant
#    eviction + segment timing + memstats (slowdown workaround + diagnosis)
python main.py --sample --ni --config flagship_eval.yml --doc flagship \
  -i flagship_r04 --max_batches 1 > bench_artifacts/r04_flagship_run.log 2>&1
echo "FLAGSHIP ABLATION DONE rc=$?"

# 3. CPU metrics for the flagship run (joint-vs-baseline-vs-cv2 evidence)
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/flagship_r04 --batch 42 --views 7 \
  --mask generated_only --out bench_artifacts/flagship_r04_metrics.json \
  > bench_artifacts/r04_metrics.log 2>&1
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/flagship_r04 --batch 42 --views 7 \
  --out bench_artifacts/flagship_r04_metrics_all.json \
  >> bench_artifacts/r04_metrics.log 2>&1

# 1. checkpoint DSM-loss sweep (curriculum-replay test loss per ckpt)
timeout 1500 python main.py --test --config flagship_train.yml --doc flagship_train \
  > bench_artifacts/r04_test_sweep.log 2>&1
echo "TEST SWEEP DONE rc=$?"

# 4. bf16-vs-f32 sampling-dtype evidence pair (21-image joint_only)
python main.py --sample --ni --config bf16_eval_f32.yml --doc flagship \
  -i bf16_f32_r04 --max_batches 1 --ckpt $CKPT \
  > bench_artifacts/r04_bf16_f32_run.log 2>&1
python main.py --sample --ni --config bf16_eval_bf16.yml --doc flagship \
  -i bf16_bf16_r04 --max_batches 1 --ckpt $CKPT \
  > bench_artifacts/r04_bf16_bf16_run.log 2>&1
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/bf16_f32_r04 --batch 21 --views 7 \
  --mask generated_only --no_classical \
  --out bench_artifacts/r04_bf16_f32_metrics.json >> bench_artifacts/r04_metrics.log 2>&1
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/bf16_bf16_r04 --batch 21 --views 7 \
  --mask generated_only --no_classical \
  --out bench_artifacts/r04_bf16_bf16_metrics.json >> bench_artifacts/r04_metrics.log 2>&1
echo "BF16 PAIR DONE"

# 5. fast_fid distribution metrics with the trained EMA weights
python main.py --fast_fid --ni --config flagship_train.yml --doc flagship \
  -i fastfid_r04 --ckpt $CKPT > bench_artifacts/r04_fastfid.log 2>&1
cp exp/fid_samples/fastfid_r04/fid_metrics.json \
  bench_artifacts/r04_fid_metrics.json 2>/dev/null

echo "ROUND4 RUN-ALL DONE"

