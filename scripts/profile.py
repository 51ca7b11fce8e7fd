"""Profile the PoseSplatter pipeline stage by stage.

Usage:
    python scripts/profile.py synthetic [--grid 96] [--width 576]
        [--height 512] [--mode 3d] [--trace DIR]
    python scripts/profile.py config <config.json> [--frame N] [--trace DIR]

Prints a JSON stage-timing report (carve / U-Nets / extraction / render /
full fwd+bwd) with Mpix/s and steps/s. ``--trace`` additionally records a
TensorBoard-compatible ``jax.profiler`` trace of one full step.
"""

import argparse
import contextlib
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from pose_splatter_tpu.utils.profiling import profile_model, trace


def synthetic(args):
    from pose_splatter_tpu.models.pose_splatter import PoseSplatter
    from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical

    C = 4
    W, H = args.width, args.height
    f = 1.6 * max(W, H)
    Ks = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]] * C, np.float32)
    Es = np.stack([
        camera_extrinsic_spherical(1.0, np.pi / 2.5, 2 * np.pi / C * i)
        for i in range(C)
    ]).astype(np.float32)
    g = args.grid
    vi = [[0, g], [0, g], [0, g]]
    model = PoseSplatter(
        Ks, Es, W, H, ell=0.3, grid_size=g, volume_idx=vi,
        gaussian_mode=args.mode,
        render_mode="pallas" if jax.default_backend() == "tpu" else "tiled",
    )
    variables = model.init(jax.random.PRNGKey(0))
    yy, xx = np.mgrid[0:H, 0:W]
    m = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 5) ** 2).astype(np.float32)
    mask = np.stack([m] * C)
    img = np.stack([np.stack([m * 0.7, m * 0.3, m * 0.5], -1)] * C)
    return model, variables, mask, img, np.zeros(3, np.float32), 0.2


def from_config(args):
    import optax

    from pose_splatter_tpu.config import Config
    from pose_splatter_tpu.train.loop import create_train_state, load_checkpoint
    from pose_splatter_tpu.train.trainer import (
        build_datasets, build_model, checkpoint_path,
    )

    config = Config(args.config)
    model = build_model(config)
    (dset,) = build_datasets(config, splits=("all_volumes",))
    state = create_train_state(model, jax.random.PRNGKey(0), optax.adam(1e-4))
    try:
        state, _ = load_checkpoint(checkpoint_path(config, False), state)
    except Exception:
        print("(no checkpoint found; profiling with random weights)",
              file=sys.stderr)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mask, img, p_3d, angle, _ = dset.get(args.frame, view_idx=0)
    return model, variables, mask, img, p_3d, angle


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("synthetic")
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--mode", default="3d", choices=["2d", "3d"])
    p.add_argument("--trace", default=None)
    p.set_defaults(fn=synthetic)
    p = sub.add_parser("config")
    p.add_argument("config")
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--trace", default=None)
    p.set_defaults(fn=from_config)
    args = parser.parse_args()

    model, variables, mask, img, p_3d, angle = args.fn(args)
    report = profile_model(model, variables, mask, img, p_3d, angle)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in report.items()}, indent=2))

    if args.trace:
        with trace(args.trace):
            rgb, alpha, _ = model.forward(
                variables, jnp.asarray(mask), jnp.asarray(img),
                jnp.asarray(p_3d), jnp.float32(angle), 0, train=False)
            np.asarray(rgb)
        print(f"trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
