#!/bin/bash
# Train + evaluate both renderer modes and diff the metrics
# (mirrors the reference's scripts/experiments/run_2d_3d_comparison.sh).
# Usage: bash scripts/run_2d_3d_comparison.sh <config_3d.json> <config_2d.json> [epochs]
set -e
CFG3D=${1:?usage: run_2d_3d_comparison.sh <config_3d.json> <config_2d.json> [epochs]}
CFG2D=${2:?need a 2D config}
EPOCHS=${3:-20}

LOG3D=$(python -c "import json,sys;print(json.load(open('$CFG3D'))['project_directory'])")/train_3d.log
LOG2D=$(python -c "import json,sys;print(json.load(open('$CFG2D'))['project_directory'])")/train_2d.log

echo "=== 3D mode ==="
python scripts/train.py "$CFG3D" --epochs "$EPOCHS" 2>&1 | tee "$LOG3D"
python scripts/evaluate.py "$CFG3D"

echo "=== 2D mode ==="
python scripts/train.py "$CFG2D" --epochs "$EPOCHS" 2>&1 | tee "$LOG2D"
python scripts/evaluate.py "$CFG2D"

echo "=== convergence curves (analyze_results.py parity) ==="
python scripts/analyze_convergence.py --log2d "$LOG2D" --log3d "$LOG3D" \
  --plot "$(dirname "$LOG2D")/convergence_comparison.pdf" \
  --out "$(dirname "$LOG2D")/convergence_summary.json"

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
