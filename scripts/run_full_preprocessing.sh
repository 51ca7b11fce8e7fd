#!/bin/bash
# Full preprocessing pipeline (steps 0-5), mirroring the reference's
# run_full_preprocessing.sh. Usage:
#   bash scripts/run_full_preprocessing.sh <config.json> [camera.pkl]
set -e
CONFIG=${1:?usage: run_full_preprocessing.sh <config.json> [camera.pkl]}
PKL=$2

LOGDIR=$(python -c "import sys,json;d=json.load(open(sys.argv[1]));print(d.get('project_directory','output'))" "$CONFIG")/logs
mkdir -p "$LOGDIR"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | tee -a "$LOGDIR/preprocessing.log"
}

if [ -n "$PKL" ]; then
  CAMH5=$(python -c "import sys,json,os;d=json.load(open(sys.argv[1]));print(os.path.join(d.get('project_directory',''), d['camera_fn']))" "$CONFIG")
  run python scripts/preprocess.py convert_cameras "$PKL" "$CAMH5"   # step 0
fi
run python scripts/preprocess.py auto_up "$CONFIG"                    # step 1
run python scripts/preprocess.py center_rotation "$CONFIG"            # step 2
run python scripts/preprocess.py crop_indices "$CONFIG"               # step 3
run python scripts/preprocess.py write_images "$CONFIG"               # step 4
run python scripts/preprocess.py to_zarr "$CONFIG"                    # step 5
echo "Preprocessing complete. Copy a suggested volume_idx into $CONFIG."
