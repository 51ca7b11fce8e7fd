"""Preprocessing pipeline driver with one subcommand per reference script.

Usage:
    python scripts/preprocess.py convert_cameras <input.pkl> <output.h5>
    python scripts/preprocess.py auto_up <config.json>
    python scripts/preprocess.py center_rotation <config.json>
    python scripts/preprocess.py crop_indices <config.json> [--force]
    python scripts/preprocess.py write_images <config.json>
    python scripts/preprocess.py to_zarr <config.json>
    python scripts/preprocess.py visual_features <config.json> [--dry_run]
                                 [--model_fn CKPT] [--resnet_weights PTH]
    python scripts/preprocess.py visual_embedding <config.json>

Step mapping to the reference (``run_full_preprocessing.sh`` steps 0-5 and
the embedding stages; SURVEY.md §3.3/§3.4).
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from pose_splatter_tpu.config import Config


def cmd_convert_cameras(args):
    from pose_splatter_tpu.preprocess.cameras import convert_camera_params

    n = convert_camera_params(args.input, args.output)
    print(f"Converted {n} cameras → {args.output}")


def cmd_auto_up(args):
    from pose_splatter_tpu.preprocess.up_direction import auto_estimate_up

    config = Config(args.config)
    os.makedirs(config.project_directory, exist_ok=True)
    up = auto_estimate_up(config.camera_fn, config.vertical_lines_fn)
    print(f"Estimated up direction: {up} → {config.vertical_lines_fn}")


def cmd_center_rotation(args):
    from pose_splatter_tpu.preprocess.center_rotation import (
        calculate_center_rotation,
    )

    config = Config(args.config)
    centers, angles, covs = calculate_center_rotation(config)
    print(f"Wrote {len(centers)} frames → {config.center_rotation_fn}")


def cmd_crop_indices(args):
    from pose_splatter_tpu.preprocess.crop_indices import (
        calculate_volume_sum,
        suggest_volume_idx,
    )

    config = Config(args.config)
    if args.force or not os.path.exists(config.volume_sum_fn):
        volume_sum = calculate_volume_sum(config)
    else:
        volume_sum = np.load(config.volume_sum_fn)
    for thresh, vi in suggest_volume_idx(volume_sum).items():
        print(f"Threshold: {thresh}")
        print(f"volume_idx: {vi}")
        print(f"n1, n2, n3: {[j - i for i, j in vi]}\n")


def cmd_write_images(args):
    from pose_splatter_tpu.preprocess.write_images import write_images

    config = Config(args.config)
    out = write_images(config)
    print(f"Wrote {out}")


def cmd_to_zarr(args):
    from pose_splatter_tpu.preprocess.write_images import copy_h5_to_zarr

    config = Config(args.config)
    h5_fn = os.path.join(config.image_directory, "images.h5")
    print(f"→ {copy_h5_to_zarr(h5_fn)}")


def cmd_visual_features(args):
    import jax
    import optax

    from pose_splatter_tpu.preprocess.visual_features import (
        calculate_visual_features,
    )
    from pose_splatter_tpu.train.loop import create_train_state, load_checkpoint
    from pose_splatter_tpu.train.trainer import (
        build_datasets,
        build_model,
        checkpoint_path,
    )

    config = Config(args.config)
    model = build_model(config)
    (dset,) = build_datasets(config, splits=("all_volumes",))
    state = create_train_state(model, jax.random.PRNGKey(0), optax.adam(1e-4))
    ckpt = args.model_fn or checkpoint_path(config, False)
    state, _ = load_checkpoint(ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    feats = calculate_visual_features(
        config, model, variables, dset,
        resnet_weights=args.resnet_weights, dry_run=args.dry_run,
    )
    print(f"Features: {feats.shape} → {config.feature_fn}")


def cmd_visual_embedding(args):
    from pose_splatter_tpu.preprocess.visual_embedding import (
        calculate_visual_embedding,
    )

    config = Config(args.config)
    emb = calculate_visual_embedding(config)
    print(f"Embedding: {emb.shape} → {config.embedding_fn}")


def main():
    parser = argparse.ArgumentParser(description="Preprocessing pipeline")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("convert_cameras")
    p.add_argument("input")
    p.add_argument("output")
    p.set_defaults(fn=cmd_convert_cameras)

    for name, fn in [("auto_up", cmd_auto_up),
                     ("center_rotation", cmd_center_rotation),
                     ("write_images", cmd_write_images),
                     ("to_zarr", cmd_to_zarr),
                     ("visual_embedding", cmd_visual_embedding)]:
        p = sub.add_parser(name)
        p.add_argument("config")
        p.set_defaults(fn=fn)

    p = sub.add_parser("crop_indices")
    p.add_argument("config")
    p.add_argument("--force", action="store_true")
    p.set_defaults(fn=cmd_crop_indices)

    p = sub.add_parser("visual_features")
    p.add_argument("config")
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("--model_fn", default=None)
    p.add_argument("--resnet_weights", default=None)
    p.set_defaults(fn=cmd_visual_features)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
