"""Weak-scaling report of the data-parallel train step.

Wires ``pose_splatter_tpu.parallel.scaling_report`` (BASELINE.md: steps/s
at 1..N devices with >=80% efficiency) to a real PoseSplatter DP step:
per-device batch is fixed, the global batch grows with the device count,
and efficiency = global frames/s relative to perfect linear scaling.

Usage:
  python scripts/scaling.py                      # current backend's devices
  python scripts/scaling.py --virtual 8          # 8-device virtual CPU mesh
  python scripts/scaling.py --out SCALING.json   # write the JSON artifact

On a single real TPU chip this degenerates to the 1-device row (still
useful as the per-chip steps/s figure); the multi-device curve runs on the
virtual CPU mesh (SURVEY.md §4) and, on a pod slice, on real chips
unchanged.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual", type=int, default=0,
                        help="force a CPU backend with N virtual devices")
    parser.add_argument("--grid", type=int, default=16)
    parser.add_argument("--size", type=int, default=48, help="render W=H")
    parser.add_argument("--width", type=int, default=0,
                        help="render width (overrides --size)")
    parser.add_argument("--height", type=int, default=0,
                        help="render height (overrides --size)")
    parser.add_argument("--cameras", type=int, default=3)
    parser.add_argument("--crop", default=None,
                        help="volume_idx x0,x1,y0,y1,z0,z1 (north-star crop)")
    parser.add_argument("--min-n", type=int, default=16)
    parser.add_argument("--max-n", type=int, default=256)
    parser.add_argument("--mode", default="3d", choices=["2d", "3d"])
    parser.add_argument("--num-unets", type=int, default=2)
    parser.add_argument("--base-filters", type=int, default=4)
    parser.add_argument("--per-device-batch", type=int, default=1)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    import jax.numpy as jnp
    import optax

    from pose_splatter_tpu.models.pose_splatter import PoseSplatter
    from pose_splatter_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        replicate_state,
        scaling_report,
        shard_batch,
    )
    from pose_splatter_tpu.train.loop import create_train_state
    from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical

    C, g = args.cameras, args.grid
    W = args.width or args.size
    H = args.height or args.size
    if args.crop:
        v = [int(x) for x in args.crop.split(",")]
        volume_idx = [[v[0], v[1]], [v[2], v[3]], [v[4], v[5]]]
    else:
        volume_idx = [[0, g]] * 3
    f = 1.4 * max(W, H)
    Ks = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]] * C,
                  np.float32)
    Es = np.stack([
        camera_extrinsic_spherical(1.2, np.pi / 3, 2 * np.pi * i / C)
        for i in range(C)
    ]).astype(np.float32)
    model = PoseSplatter(
        Ks, Es, W, H, ell=0.5, grid_size=g, volume_idx=volume_idx,
        min_n=args.min_n, max_n=args.max_n,
        num_unets=args.num_unets, base_filters=args.base_filters,
        gaussian_mode=args.mode,
        render_mode="tiled" if jax.default_backend() != "tpu" else "pallas",
        tile_shape=None if jax.default_backend() == "tpu" else (16, 64),
    )
    tx = optax.adam(1e-3)

    yy, xx = np.mgrid[0:H, 0:W]
    mask = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2)
            < (H / 4) ** 2).astype(np.float32)
    img = np.stack([mask * 0.7, mask * 0.3, mask * 0.5], -1)

    def make_step_and_inputs(devices):
        n = len(devices)
        B = n * args.per_device_batch
        mesh = make_mesh((n,), ("data",), devices=devices)
        step_fn = make_sharded_train_step(
            model, tx, img_lambda=0.5, ssim_lambda=0.0, mesh=mesh)
        state = replicate_state(
            create_train_state(model, jax.random.PRNGKey(0), tx), mesh)
        batch = shard_batch(dict(
            mask=jnp.broadcast_to(jnp.asarray(np.stack([mask] * C))[None],
                                  (B, C, H, W)),
            img=jnp.broadcast_to(jnp.asarray(np.stack([img] * C))[None],
                                 (B, C, H, W, 3)),
            p_3d=jnp.zeros((B, 3)),
            angle=jnp.linspace(0, 0.4, B),
            view_idx=jnp.zeros((B,), jnp.int32),
            obs_idx=jnp.zeros((B,), jnp.int32),
        ), mesh)
        return step_fn, state, batch

    report = scaling_report(make_step_and_inputs,
                            spmd_baseline=bool(args.virtual))
    report["backend"] = jax.default_backend()
    report["devices_total"] = len(jax.devices())
    report["per_device_batch"] = args.per_device_batch
    report["config"] = (f"{W}x{H} grid{g} C{C} mode={args.mode} "
                        f"unets{args.num_unets} bf{args.base_filters}"
                        + (f" crop({args.crop})" if args.crop else ""))
    mpix = W * H / 1e6
    for row in report.get("rows", []):
        row["mpix_per_s_per_device"] = round(
            row["steps_per_s"] * args.per_device_batch * mpix, 3)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
