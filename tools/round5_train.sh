#!/bin/bash
# Round-5 flagship training: a main window at lr 1e-4 (flagship_train.yml,
# training.max_seconds self-limits with a clean checkpoint+exit) followed
# by a low-LR polish window (flagship_polish.yml, lr 3e-5) resuming the
# same log dir.  ONE TPU client at a time throughout.
#
# Shutdown discipline (ADVICE r4): the trainer ends its own window via
# max_seconds; the orchestrator's deadline fallback drops a STOP file
# (runners/train.py:57 checks it between true steps and checkpoints
# before exiting) and only escalates to SIGTERM after a long grace
# period.  kill -9 is reserved for the stale-log watchdog, which targets
# a wedged RPC, never a live trainer.
set -x
cd /root/repo
mkdir -p bench_artifacts
LOGDIR=exp/logs/flagship_train
rm -f "$LOGDIR/STOP"

run_window() {  # $1 = config, $2 = wall-clock fallback deadline (secs)
  local config=$1 deadline=$(( $(date +%s) + $2 ))
  export TRAIN_CONFIG=$config
  rm -f "$LOGDIR/STOP"
  touch /tmp/train_watchdog_on
  nohup python main.py --config "$config" --ni --resume_training \
    --doc flagship_train >> "bench_artifacts/r05_train_${config%.yml}.log" 2>&1 &
  echo $! > /tmp/train.pid
  nohup bash tools/train_watchdog.sh >> /tmp/watchdog.log 2>&1 &
  local wd=$!

  while [ "$(date +%s)" -lt "$deadline" ]; do
    sleep 30
    local pid
    pid=$(cat /tmp/train.pid 2>/dev/null)
    kill -0 "$pid" 2>/dev/null || break
  done
  rm -f /tmp/train_watchdog_on
  kill "$wd" 2>/dev/null

  local pid
  pid=$(cat /tmp/train.pid 2>/dev/null)
  if kill -0 "$pid" 2>/dev/null; then
    # deadline passed (watchdog relaunches reset the trainer's own clock):
    # clean STOP-file shutdown, generous grace for the in-flight step +
    # Orbax save, SIGTERM only as a last resort, long settle before the
    # next TPU client.
    touch "$LOGDIR/STOP"
    for _ in $(seq 24); do
      sleep 10
      kill -0 "$pid" 2>/dev/null || break
    done
    if kill -0 "$pid" 2>/dev/null; then
      kill "$pid" 2>/dev/null
      sleep 45
    fi
  fi
  rm -f "$LOGDIR/STOP"
  echo "WINDOW $config DONE"
}

# main window: constant lr 1e-4 (max_seconds 10800 in the config)
run_window flagship_train.yml 11700
# polish window: lr 3e-5 (max_seconds 5400 in the config)
run_window flagship_polish.yml 6300

echo "ROUND5 TRAINING DONE"
