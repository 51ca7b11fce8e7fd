#!/bin/bash
# Training wrapper with logging (mirrors the reference's run_training.sh).
# Usage: bash scripts/run_training.sh <config.json> [extra train args...]
set -e
CONFIG=${1:?usage: run_training.sh <config.json> [args...]}
shift
LOGDIR=$(python -c "import sys,json;d=json.load(open(sys.argv[1]));print(d.get('project_directory','output'))" "$CONFIG")/logs
mkdir -p "$LOGDIR"
python scripts/train.py "$CONFIG" "$@" 2>&1 | tee -a "$LOGDIR/training.log"
