"""Export Gaussian parameters for external viewers.

Usage:
    python scripts/export_gaussians.py <config.json> --frame N
        [--format npz|ply_extended|json|ply] [--output_dir DIR]
    python scripts/export_gaussians.py <config.json> --start 0 --end 100
        [--format npz] [--output_dir DIR]          # animation sequence

Covers the reference's ``export_gaussian_full.py``, ``export_point_cloud.py``
and ``export_animation_sequence.py`` (same on-disk formats).
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import jax
import optax

from pose_splatter_tpu.config import Config
from pose_splatter_tpu.train.loop import create_train_state, load_checkpoint
from pose_splatter_tpu.train.trainer import (
    build_datasets,
    build_model,
    checkpoint_path,
)
from pose_splatter_tpu.viz.export import (
    export_animation_sequence,
    extract_world_gaussians,
    save_json,
    save_npz,
    save_ply_extended,
    save_ply_pointcloud,
)

SAVERS = {"npz": save_npz, "ply_extended": save_ply_extended,
          "json": save_json, "ply": save_ply_pointcloud}
EXT = {"npz": "npz", "ply_extended": "ply", "json": "json", "ply": "ply"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--frame", type=int, default=None)
    parser.add_argument("--start", type=int, default=None)
    parser.add_argument("--end", type=int, default=None)
    parser.add_argument("--format", default="npz", choices=list(SAVERS))
    parser.add_argument("--output_dir", default=None)
    args = parser.parse_args()
    config = Config(args.config)

    model = build_model(config)
    (dset,) = build_datasets(config, splits=("all_volumes",))
    state = create_train_state(model, jax.random.PRNGKey(0), optax.adam(1e-4))
    state, _ = load_checkpoint(checkpoint_path(config, False), state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    out_dir = args.output_dir or os.path.join(config.project_directory,
                                              "exports")
    os.makedirs(out_dir, exist_ok=True)

    if args.frame is not None:
        mask, img, p_3d, angle, _ = dset.get(args.frame, view_idx=0)
        g = extract_world_gaussians(model, variables, mask, img, p_3d, angle)
        fn = os.path.join(
            out_dir, f"gaussian_frame{args.frame:04d}.{EXT[args.format]}")
        SAVERS[args.format](g, fn)
        print(f"Exported {len(g['means'])} Gaussians → {fn}")
    else:
        assert args.start is not None and args.end is not None, \
            "give --frame or --start/--end"
        paths = export_animation_sequence(
            model, variables, dset, range(args.start, args.end),
            out_dir, format_type=args.format,
        )
        print(f"Exported {len(paths)} frames → {out_dir}")


if __name__ == "__main__":
    main()
