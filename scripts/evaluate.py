"""Evaluate a trained model: render the test split + per-camera metrics.

Usage: python scripts/evaluate.py <config.json> [--ablation] [--split test]

Pipeline parity with ``/root/reference/scripts/utils/evaluate_model.py``:
renders all C views per test frame to ``rendered_images.h5``, then computes
l1 / iou / soft_iou / psnr / ssim per camera → ``metrics_test.csv`` and an
``evaluation_metrics.json`` summary.
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import jax
import optax

from pose_splatter_tpu.config import Config
from pose_splatter_tpu.train.evaluate import (
    calculate_image_metrics,
    render_images,
    write_evaluation_summary,
)
from pose_splatter_tpu.train.loop import create_train_state, load_checkpoint
from pose_splatter_tpu.train.trainer import (
    build_datasets,
    build_model,
    checkpoint_path,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--ablation", action="store_true")
    parser.add_argument("--split", default="test",
                        choices=["train", "valid", "test"])
    parser.add_argument("--lpips_weights", default=None,
                        help="Path to LPIPS/AlexNet weights (optional)")
    args = parser.parse_args()
    config = Config(args.config)

    model = build_model(config, ablation=args.ablation)
    (test_ds,) = build_datasets(config, splits=(args.split,))
    (all_ds,) = build_datasets(config, splits=("all_volumes",))

    state = create_train_state(model, jax.random.PRNGKey(0), optax.adam(1e-4))
    state, _ = load_checkpoint(checkpoint_path(config, args.ablation), state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    os.makedirs(config.render_directory, exist_ok=True)
    render_fn = os.path.join(config.render_directory, "rendered_images.h5")
    render_images(model, variables, test_ds, len(all_ds), render_fn,
                  compression_level=config.image_compression_level or 2)

    gt_fn = os.path.join(config.image_directory, "images.h5")
    metrics_fn = os.path.join(config.project_directory,
                              f"metrics_{args.split}.csv")
    metrics = calculate_image_metrics(render_fn, gt_fn, metrics_fn,
                                      split=args.split)
    if args.lpips_weights:
        from pose_splatter_tpu.train.evaluate import calculate_lpips_metric

        lpips = calculate_lpips_metric(render_fn, gt_fn, args.lpips_weights,
                                       split=args.split)
        if lpips is not None:
            metrics["lpips"] = lpips
    summary_fn = os.path.join(config.project_directory,
                              "evaluation_metrics.json")
    write_evaluation_summary(metrics, summary_fn)
    for k, v in metrics.items():
        print(f"{k}: mean={float(v.mean()):.4f}")


if __name__ == "__main__":
    main()
