#!/bin/bash
# Evaluation wrapper (mirrors the reference's run_evaluation.sh).
set -e
CONFIG=${1:?usage: run_evaluation.sh <config.json>}
python scripts/evaluate.py "$CONFIG" 2>&1 | tee -a evaluation.log
