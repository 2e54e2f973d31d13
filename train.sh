#!/usr/bin/env bash
# Training launcher (counterpart of the reference's TrainBash.sh): prepares
# the experiment directories and resumes curriculum training headlessly.
set -euo pipefail
EXP=${EXP:-exp}
DOC=${DOC:-line}
CONFIG=${CONFIG:-Line.yml}
mkdir -p "$EXP/logs" "$EXP/tensorboard"
exec python main.py --config "$CONFIG" --exp "$EXP" --doc "$DOC" --resume_training --ni "$@"
