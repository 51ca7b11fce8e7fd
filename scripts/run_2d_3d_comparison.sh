#!/bin/bash
# Train + evaluate both renderer modes and diff the metrics
# (mirrors the reference's scripts/experiments/run_2d_3d_comparison.sh).
# Usage: bash scripts/run_2d_3d_comparison.sh <config_3d.json> <config_2d.json> [epochs]
set -e
CFG3D=${1:?usage: run_2d_3d_comparison.sh <config_3d.json> <config_2d.json> [epochs]}
CFG2D=${2:?need a 2D config}
EPOCHS=${3:-20}

echo "=== 3D mode ==="
python scripts/train.py "$CFG3D" --epochs "$EPOCHS"
python scripts/evaluate.py "$CFG3D"

echo "=== 2D mode ==="
python scripts/train.py "$CFG2D" --epochs "$EPOCHS"
python scripts/evaluate.py "$CFG2D"

echo "=== comparison ==="
python - "$CFG3D" "$CFG2D" <<'EOF'
import json, sys
for cfg_fn in sys.argv[1:3]:
    cfg = json.load(open(cfg_fn))
    fn = cfg["project_directory"] + "/evaluation_metrics.json"
    m = json.load(open(fn))
    print(cfg_fn, {k: round(v["mean"], 4) for k, v in m.items()
                   if isinstance(v, dict)})
EOF
