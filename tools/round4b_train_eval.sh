#!/bin/bash
# Round-4b: continue the flagship fine-tune for training.max_seconds
# (flagship_train.yml, clean checkpoint+exit), then run the focused
# joint-vs-baseline ablation pair (settings 5/6 via plan_start) with the
# refreshed rolling checkpoint and summarise.  Launch DETACHED
# (setsid nohup); ONE TPU client at a time throughout.
set -x
cd /root/repo
mkdir -p bench_artifacts
DEADLINE=$(( $(date +%s) + ${TRAIN_DEADLINE_SECS:-7500} ))

touch /tmp/train_watchdog_on
nohup python main.py --config flagship_train.yml --ni --resume_training \
  --doc flagship_train >> bench_artifacts/r04b_finetune.log 2>&1 &
echo $! > /tmp/train.pid
nohup bash tools/train_watchdog.sh >> /tmp/watchdog.log 2>&1 &
WD=$!

# wait for the trainer (or a watchdog relaunch of it) to finish, with a
# hard wall-clock deadline so the eval always gets its TPU window
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 30
  pid=$(cat /tmp/train.pid 2>/dev/null)
  kill -0 "$pid" 2>/dev/null || break
done
rm -f /tmp/train_watchdog_on
kill "$WD" 2>/dev/null
pid=$(cat /tmp/train.pid 2>/dev/null)
if kill -0 "$pid" 2>/dev/null; then
  kill "$pid" 2>/dev/null
  sleep 25
  kill -9 "$pid" 2>/dev/null
  sleep 10
fi
echo "TRAINING WINDOW DONE"

# joint (setting 5) vs per-view baseline (setting 6) at the flagship shape
python main.py --sample --ni --config flagship_eval_jb.yml --doc flagship \
  -i flagship_r04b --max_batches 1 > bench_artifacts/r04b_jb_run.log 2>&1
echo "JB ABLATION DONE rc=$?"
python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
  --image_folder exp/image_samples/flagship_r04b --batch 42 --views 7 \
  --mask generated_only --out bench_artifacts/flagship_r04b_metrics.json \
  > bench_artifacts/r04b_metrics.log 2>&1
python tools/quality_report.py bench_artifacts/flagship_r04b_metrics.json \
  --views 7 --out bench_artifacts/flagship_r04b_summary.json \
  >> bench_artifacts/r04b_metrics.log 2>&1
echo "ROUND4B DONE"
