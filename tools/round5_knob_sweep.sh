#!/bin/bash
# Round-5 consistency-knob sweep on the trained checkpoint (VERDICT r4 #1/#3):
# joint-only 21-image (3 scenes x 7 views) full-ladder runs over the
# consistency hyperparameters the reference hardcodes
# (ncsn_runner_kitti_simultaneous.py:574-579), scored by MAE on generated
# pixels.  bf16 trunk for sweep speed (cells compared against each other);
# the winning cell is confirmed at f32 in the follow-up JB pair.
# Default checkpoint is ckpt_205 — the r04b winner (joint 9.94 < baseline
# 10.03); ckpt_268 (post-polish) regressed both MAE and fast_fid JSD.
# Two probe cells re-run the control knobs at polish-window checkpoints
# (212, 220) to map where the polish regression begins.
# Usage: CKPT=exp/logs/flagship_train/ckpt_XXX bash tools/round5_knob_sweep.sh
# Launch DETACHED; ONE TPU client at a time.
set -x
cd /root/repo
mkdir -p bench_artifacts /tmp/knob_cfgs
CKPT=${CKPT:-exp/logs/flagship_train/ckpt_205}

python - << 'EOF'
import yaml
base = yaml.safe_load(open('configs/bf16_eval_f32.yml'))
base['model']['compute_dtype'] = 'bfloat16'
base['sampling']['segment_timing'] = False
base['sampling']['evict_executables'] = True
cells = {
    'c0_control':  {},
    'c1_corr05':   {'correlation_coefficient': 0.05},
    'c2_corr10_g09': {'correlation_coefficient': 0.1, 'grad_ref': 0.9},
    'c3_corr003':  {'correlation_coefficient': 0.003},
    'c4_start2':   {'start_step': 2},
    'c5_nse8':     {'n_steps_each': 8},
    'c6_ckpt212':  {},
    'c7_ckpt220':  {},
}
for name, over in cells.items():
    cfg = yaml.safe_load(yaml.safe_dump(base))
    cfg['sampling'].update(over)
    with open(f'/tmp/knob_cfgs/{name}.yml', 'w') as f:
        yaml.safe_dump(cfg, f)
print('cells written')
EOF

run_cell () {
  local cell=$1 ckpt=$2
  python main.py --sample --ni --config "/tmp/knob_cfgs/${cell}.yml" \
    --doc flagship -i "knob_${cell}" --max_batches 1 --ckpt "$ckpt" \
    > "bench_artifacts/r05_knob_${cell}.log" 2>&1
  echo "CELL ${cell} rc=$?"
  python -m simultaneous_diffusion_for_pointclouds_tpu.eval.metrics \
    --image_folder "exp/image_samples/knob_${cell}" --batch 21 --views 7 \
    --mask generated_only --no_classical \
    --out "bench_artifacts/r05_knob_${cell}_metrics.json" \
    >> "bench_artifacts/r05_knob_${cell}.log" 2>&1
}

for cell in c0_control c1_corr05 c2_corr10_g09 c3_corr003 c4_start2 c5_nse8; do
  run_cell "$cell" "$CKPT"
done
run_cell c6_ckpt212 exp/logs/flagship_train/ckpt_212
run_cell c7_ckpt220 exp/logs/flagship_train/ckpt_220

python - << 'EOF'
import json, glob
rows = {}
for p in sorted(glob.glob('bench_artifacts/r05_knob_*_metrics.json')):
    name = p.split('r05_knob_')[1].split('_metrics')[0]
    d = json.load(open(p))
    per_view = list(d['mae_range_m'].values())[0]
    rows[name] = {'mae_m': sum(per_view) / len(per_view), 'per_view': per_view,
                  'time_s': list(d['time_taken_s'].values())[0]}
print(json.dumps(rows, indent=2))
json.dump(rows, open('bench_artifacts/r05_knob_sweep_summary.json', 'w'), indent=2)
EOF
echo "KNOB SWEEP DONE"
