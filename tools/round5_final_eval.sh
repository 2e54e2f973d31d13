#!/bin/bash
# Round-5 FINAL headline eval: f32 joint-vs-baseline 42-image ablation plus
# fast_fid from the selected checkpoint, with the knob-sweep winner's
# consistency overrides applied to the joint run.  Overwrites the r05
# artifacts (flagship_r05_*.json, r05_fid_metrics.json) that previously
# held the regressed ckpt_268 numbers.
# Usage:
#   CKPT=exp/logs/flagship_train/ckpt_205 \
#   KNOBS_JSON='{"correlation_coefficient": 0.05}' \
#   bash tools/round5_final_eval.sh
# Launch DETACHED; ONE TPU client at a time.
set -x
cd /root/repo
mkdir -p bench_artifacts
CKPT=${CKPT:-exp/logs/flagship_train/ckpt_205}
KNOBS_JSON=${KNOBS_JSON:-'{}'}

KNOBS_JSON="$KNOBS_JSON" python - << 'EOF'
import json, os, yaml
cfg = yaml.safe_load(open('configs/flagship_eval_jb.yml'))
cfg['sampling'].update(json.loads(os.environ['KNOBS_JSON']))
with open('/tmp/r05_final_eval.yml', 'w') as f:
    yaml.safe_dump(cfg, f)
print('final eval config written:', json.loads(os.environ['KNOBS_JSON']))
EOF

python main.py --sample --ni --config /tmp/r05_final_eval.yml --doc flagship \
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

python main.py --fast_fid --ni --config flagship_train.yml --doc flagship \
  -i fastfid_r05 --ckpt "$CKPT" \
  > bench_artifacts/r05_fastfid.log 2>&1
cp exp/fid_samples/fastfid_r05/fid_metrics.json \
  bench_artifacts/r05_fid_metrics.json 2>/dev/null
echo "FASTFID DONE"
echo "ROUND5 FINAL EVAL DONE"
