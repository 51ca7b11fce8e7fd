"""Render a single frame from a novel view at full resolution.

Usage: python scripts/render_image.py <config.json> [--frame N] [--view V]
       [--angle_offset RAD] [--dx X --dy Y --dz Z] [--output out.png]

Parity with ``/root/reference/scripts/visualization/render_image.py:180-217``
(also the engine for the 360°/multiview/temporal drivers; see
``scripts/generate_videos.py``).
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import optax

from pose_splatter_tpu.config import Config
from pose_splatter_tpu.train.loop import create_train_state, load_checkpoint
from pose_splatter_tpu.train.trainer import (
    build_datasets,
    build_model,
    checkpoint_path,
)
from pose_splatter_tpu.utils.cameras import get_cam_params
from pose_splatter_tpu.viz.render_image import render_novel_view


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--view", type=int, default=0)
    parser.add_argument("--angle_offset", type=float, default=0.0)
    parser.add_argument("--dx", type=float, default=0.0)
    parser.add_argument("--dy", type=float, default=0.0)
    parser.add_argument("--dz", type=float, default=0.0)
    parser.add_argument("--output", default=None)
    args = parser.parse_args()
    config = Config(args.config)

    # Full-resolution intrinsics (render_image.py:25-44).
    K_full, _, _ = get_cam_params(
        config.camera_fn, ds=1, up_fn=config.vertical_lines_fn,
        auto_orient=True, load_up_direction=not config.adaptive_camera,
    )

    model = build_model(config)
    (dset,) = build_datasets(config, splits=("all_volumes",))
    state = create_train_state(model, jax.random.PRNGKey(0), optax.adam(1e-4))
    state, _ = load_checkpoint(checkpoint_path(config, False), state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    mask, img, p_3d, angle, _ = dset.get(args.frame, view_idx=args.view)
    rgb = render_novel_view(
        model, variables, mask, img, p_3d, angle, args.view, K_full,
        config.image_width, config.image_height,
        angle_offset=args.angle_offset,
        delta_xyz=(args.dx, args.dy, args.dz),
    )

    out = args.output or os.path.join(
        config.project_directory,
        f"render_f{args.frame:04d}_v{args.view}.png",
    )
    try:
        from PIL import Image

        Image.fromarray((rgb * 255).astype(np.uint8)).save(out)
    except ImportError:
        import matplotlib

        matplotlib.use("agg")
        import matplotlib.pyplot as plt

        plt.imsave(out, rgb)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
