"""Video/multiview generation drivers.

Usage:
    python scripts/generate_videos.py 360 <config.json> --frame N [--steps 36]
    python scripts/generate_videos.py multiview <config.json> --frame N
    python scripts/generate_videos.py temporal <config.json> --start A --end B
        [--view V]

Covers the reference's ``generate_360_rotation.py``,
``generate_multiview.py`` and ``generate_temporal_video.py`` (which drive
``render_image.py`` via subprocess and ffmpeg; here the render loop is
in-process and ffmpeg is invoked once per video if available).
"""

import argparse
import os
import shutil
import subprocess
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


def _save_png(rgb, fn):
    try:
        from PIL import Image

        Image.fromarray((rgb * 255).astype(np.uint8)).save(fn)
    except ImportError:
        import matplotlib

        matplotlib.use("agg")
        import matplotlib.pyplot as plt

        plt.imsave(fn, rgb)


def _ffmpeg(frames_dir, out_mp4, fps=10):
    if shutil.which("ffmpeg") is None:
        print("ffmpeg not found; PNG frames left in", frames_dir)
        return
    subprocess.run(
        ["ffmpeg", "-y", "-framerate", str(fps), "-pattern_type", "glob",
         "-i", os.path.join(frames_dir, "*.png"),
         "-c:v", "libx264", "-pix_fmt", "yuv420p", out_mp4],
        check=False, capture_output=True,
    )
    print("Wrote", out_mp4)


def _load(config):
    model = build_model(config)
    (dset,) = build_datasets(config, splits=("all_volumes",))
    state = create_train_state(model, jax.random.PRNGKey(0), optax.adam(1e-4))
    state, _ = load_checkpoint(checkpoint_path(config, False), state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    K_full, _, _ = get_cam_params(
        config.camera_fn, ds=1, up_fn=config.vertical_lines_fn,
        auto_orient=True, load_up_direction=not config.adaptive_camera,
    )
    return model, dset, variables, K_full


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["360", "multiview", "temporal"])
    parser.add_argument("config")
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--view", type=int, default=0)
    parser.add_argument("--steps", type=int, default=36)
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=100)
    parser.add_argument("--fps", type=int, default=10)
    args = parser.parse_args()
    config = Config(args.config)
    model, dset, variables, K_full = _load(config)
    W, H = config.image_width, config.image_height

    out_dir = os.path.join(config.project_directory, f"video_{args.mode}")
    os.makedirs(out_dir, exist_ok=True)

    if args.mode == "360":
        mask, img, p_3d, angle, _ = dset.get(args.frame, view_idx=args.view)
        for k in range(args.steps):
            rgb = render_novel_view(
                model, variables, mask, img, p_3d, angle, args.view, K_full,
                W, H, angle_offset=2 * np.pi * k / args.steps)
            _save_png(rgb, os.path.join(out_dir, f"rot_{k:03d}.png"))
        _ffmpeg(out_dir, os.path.join(config.project_directory,
                                      f"rotation_f{args.frame:04d}.mp4"),
                args.fps)
    elif args.mode == "multiview":
        mask, img, p_3d, angle, _ = dset.get(args.frame, view_idx=0)
        for v in range(model.num_cameras):
            rgb = render_novel_view(model, variables, mask, img, p_3d, angle,
                                    v, K_full, W, H)
            _save_png(rgb, os.path.join(out_dir, f"view_{v}.png"))
        print("Wrote", out_dir)
    else:  # temporal
        for frame in range(args.start, args.end):
            mask, img, p_3d, angle, _ = dset.get(frame, view_idx=args.view)
            rgb = render_novel_view(model, variables, mask, img, p_3d, angle,
                                    args.view, K_full, W, H)
            _save_png(rgb, os.path.join(out_dir, f"frame_{frame:05d}.png"))
        _ffmpeg(out_dir, os.path.join(config.project_directory,
                                      "temporal.mp4"), args.fps)


if __name__ == "__main__":
    main()
