"""Visualization helpers.

Usage:
    python scripts/visualize.py gaussians <exported.npz> [--output g.pdf]
    python scripts/visualize.py voxels <config.json> [--frame N]
    python scripts/visualize.py training <config.json>
    python scripts/visualize.py renders <config.json> [--num 5]
    python scripts/visualize.py ellipses <config.json>

Covers ``visualize_gaussian.py`` (matplotlib 3D scatter of exported npz),
``plot_voxels.py`` (carving-parameter tuning), ``visualize_training.py``
(loss curves from checkpoint history), and ``visualize_renders.py``
(GT-vs-render grids from the evaluation HDF5); ``ellipses`` adds the
reference's body-Gaussian trajectory diagnostic (``src/plots.py:259-312``):
per-frame mean/covariance ellipses with tracked principal axes from
center_rotation.npz.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from pose_splatter_tpu.config import Config


def cmd_gaussians(args):
    from pose_splatter_tpu.viz.plots import plot_gaussian_scatter

    d = np.load(args.path, allow_pickle=True)
    g = {k: d[k] for k in ("means", "colors")}
    out = args.output or os.path.splitext(args.path)[0] + ".pdf"
    print("Saved", plot_gaussian_scatter(g, out))


def cmd_voxels(args):
    import jax.numpy as jnp

    from pose_splatter_tpu.train.trainer import build_datasets, build_model
    from pose_splatter_tpu.viz.plots import plot_voxels

    config = Config(args.config)
    model = build_model(config)
    (dset,) = build_datasets(config, splits=("all_volumes",))
    mask, img, p_3d, angle, _ = dset.get(args.frame, view_idx=0)
    vol = model.carve(jnp.asarray(mask), jnp.asarray(img),
                      jnp.asarray(p_3d), jnp.float32(angle))
    out = os.path.join(config.project_directory, "voxels.pdf")
    print("Saved", plot_voxels(np.asarray(vol[0]), out))


def cmd_ellipses(args):
    from pose_splatter_tpu.viz.plots import plot_ellipses

    config = Config(args.config)
    d = np.load(config.center_rotation_fn)
    if "covs" not in d:
        raise SystemExit("center_rotation.npz has no 'covs' — rerun "
                         "scripts/preprocess.py center_rotation")
    n = min(len(d["centers"]), args.num)
    out = os.path.join(config.project_directory, "ellipses.pdf")
    print("Saved", plot_ellipses(d["centers"][:n], d["covs"][:n], out))


def cmd_training(args):
    from pose_splatter_tpu.train.trainer import checkpoint_path
    from pose_splatter_tpu.viz.plots import plot_losses

    config = Config(args.config)
    meta_fn = checkpoint_path(config, False) + ".meta.json"
    with open(meta_fn) as f:
        meta = json.load(f)
    out = os.path.join(config.project_directory, "training_curves.pdf")
    print("Saved", plot_losses(meta["losses"], meta.get("validation_losses"),
                               config.valid_every, out))


def cmd_renders(args):
    import h5py
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    config = Config(args.config)
    gt_fn = os.path.join(config.image_directory, "images.h5")
    pred_fn = os.path.join(config.render_directory, "rendered_images.h5")
    with h5py.File(gt_fn, "r") as gf, h5py.File(pred_fn, "r") as pf:
        T = len(gf["images"])
        i1 = 2 * (T // 3)  # test split start
        idxs = np.linspace(i1, T - 1, args.num, dtype=int)
        _, axarr = plt.subplots(nrows=args.num, ncols=2,
                                figsize=(5, 2.2 * args.num))
        for row, idx in enumerate(idxs):
            axarr[row, 0].imshow(gf["images"][idx][0])
            axarr[row, 1].imshow(pf["images"][idx][0][..., :3])
            for ax in axarr[row]:
                ax.axis("off")
        axarr[0, 0].set_title("Ground Truth")
        axarr[0, 1].set_title("Render")
    out = os.path.join(config.project_directory, "render_grid.pdf")
    plt.tight_layout()
    plt.savefig(out)
    print("Saved", out)


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("gaussians")
    p.add_argument("path")
    p.add_argument("--output", default=None)
    p.set_defaults(fn=cmd_gaussians)

    p = sub.add_parser("voxels")
    p.add_argument("config")
    p.add_argument("--frame", type=int, default=0)
    p.set_defaults(fn=cmd_voxels)

    p = sub.add_parser("training")
    p.add_argument("config")
    p.set_defaults(fn=cmd_training)

    p = sub.add_parser("ellipses")
    p.add_argument("config")
    p.add_argument("--num", type=int, default=200)
    p.set_defaults(fn=cmd_ellipses)

    p = sub.add_parser("renders")
    p.add_argument("config")
    p.add_argument("--num", type=int, default=5)
    p.set_defaults(fn=cmd_renders)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
