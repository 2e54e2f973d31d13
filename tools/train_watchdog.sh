#!/bin/bash
# Watchdog for the long training run: the axon tunnel occasionally orphans
# a client's in-flight execute (~hourly; PERF_NOTES round-4 note), leaving
# the trainer blocked forever on a dead RPC. If the training log goes
# stale for >600 s while the process is alive, kill it BY PID (never by
# pattern) and relaunch with --resume_training (typed Orbax restore +
# progress.json make this lossless to the last snapshot).
LOG=/root/repo/exp/logs/flagship_train/stdout.txt
PIDFILE=/tmp/train.pid
while [ -f /tmp/train_watchdog_on ]; do
  sleep 60
  pid=$(cat "$PIDFILE" 2>/dev/null)
  [ -z "$pid" ] && continue
  kill -0 "$pid" 2>/dev/null || continue   # process exited on its own
  age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
  if [ "$age" -gt 600 ]; then
    echo "$(date) stale ${age}s; killing $pid and resuming" >> /tmp/watchdog.log
    kill -9 "$pid"
    sleep 15
    nohup python main.py --config "${TRAIN_CONFIG:-flagship_train.yml}" --ni \
      --resume_training --doc flagship_train >> /tmp/flagship_train_wd.out 2>&1 &
    echo $! > "$PIDFILE"
    echo "$(date) relaunched as $(cat $PIDFILE)" >> /tmp/watchdog.log
  fi
done
