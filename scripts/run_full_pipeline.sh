#!/bin/bash
# End-to-end: preprocessing → training → evaluation → sample renders
# (mirrors the reference's run_full_pipeline.sh steps 2-8).
# Usage: bash scripts/run_full_pipeline.sh <config.json> [epochs]
set -e
CONFIG=${1:?usage: run_full_pipeline.sh <config.json> [epochs]}
EPOCHS=${2:-50}

bash scripts/run_full_preprocessing.sh "$CONFIG"
bash scripts/run_training.sh "$CONFIG" --epochs "$EPOCHS"
python scripts/evaluate.py "$CONFIG"
python scripts/render_image.py "$CONFIG" --frame 0 --view 0
echo "Pipeline complete."
