"""Data-time vs step-time breakdown at the north-star shape.

Builds an on-disk uint8 dataset (images.h5 [T,C,H,W,3] + center_rotation.npz,
the reference's format), then measures:

1. loader-only throughput — FrameLoader with the production thread pool,
   reading + decoding every batch (reference comparison point: torch
   DataLoader workers, ``scripts/training/train_script.py:276-278``);
2. step-only time — the jitted train step on one cached batch;
3. overlapped loop — the trainer's actual loop (loader feeding the step).

Prints one JSON object. The pipeline is healthy iff
``overlapped_ms ~= step_ms`` (the loader hides behind the device step).

Usage: python scripts/dbg_input_pipeline.py [--frames 48] [--steps 30]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import optax

C, H, W, GRID = 6, 512, 576, 128
CROP = "16,112,24,104,32,96"


def build_dataset(root, T):
    import h5py

    rng = np.random.default_rng(0)
    img_fn = os.path.join(root, "images.h5")
    # White background + a textured disc per view (decode cost is what
    # matters here, not scene realism).
    yy, xx = np.mgrid[0:H, 0:W]
    disc = ((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 5) ** 2
    with h5py.File(img_fn, "w") as f:
        d = f.create_dataset("images", (T, C, H, W, 3), dtype="u1",
                             chunks=(1, 1, H, W, 3))
        for t in range(T):
            frame = np.full((C, H, W, 3), 255, np.uint8)
            tex = (rng.integers(0, 200, (C, H, W, 3))).astype(np.uint8)
            frame[:, disc] = tex[:, disc]
            d[t] = frame
    np.savez(os.path.join(root, "center_rotation.npz"),
             centers=np.zeros((T, 3), np.float32),
             angles=np.zeros((T,), np.float32),
             covs=np.zeros((T, 3, 3), np.float32))
    return img_fn, os.path.join(root, "center_rotation.npz")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=48)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from pose_splatter_tpu.data.dataset import FrameDataset, FrameLoader
    from pose_splatter_tpu.models.pose_splatter import (
        init_means2d_center,
    )
    from pose_splatter_tpu.train.loop import create_train_state, make_train_step
    from scripts.synthetic_benchmark import build_model

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        img_fn, ang_fn = build_dataset(root, args.frames)
        print(f"dataset built in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

        ds = FrameDataset(img_fn, ang_fn, C, holdout_views=[C - 1],
                          split="train")
        loader = FrameLoader(ds, batch_size=1, shuffle=True,
                             workers=args.workers)

        # 1. loader-only: drain batches, no device work.
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            n += 1
            if n >= args.steps:
                break
        data_ms = (time.perf_counter() - t0) / n * 1e3

        model = build_model(C, H, W, GRID, "2d", crop=CROP)
        tx = optax.adam(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0), tx)
        state = state._replace(
            params=init_means2d_center(state.params, W, H))
        step = make_train_step(model, tx, img_lambda=0.5, ssim_lambda=0.1,
                               donate=False)

        # 2. step-only on one cached (device-resident) batch.
        import jax.numpy as jnp

        batch = next(iter(loader))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        st, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        t0 = time.perf_counter()
        for _ in range(5):
            st, metrics = step(state, batch)
        np.asarray(metrics["total"])
        step_ms = (time.perf_counter() - t0) / 5 * 1e3

        # 3. overlapped: the trainer loop shape (loader feeds the step).
        n = 0
        t0 = time.perf_counter()
        for b in loader:
            st, metrics = step(st, {k: jnp.asarray(v) for k, v in b.items()})
            n += 1
            if n >= args.steps:
                break
        np.asarray(metrics["total"])
        overlapped_ms = (time.perf_counter() - t0) / n * 1e3

    report = dict(
        config=f"{W}x{H} grid{GRID} 2d C{C} crop({CROP})",
        workers=args.workers,
        data_ms_per_batch=round(data_ms, 2),
        step_ms=round(step_ms, 2),
        overlapped_ms=round(overlapped_ms, 2),
        input_bound=bool(overlapped_ms > 1.15 * step_ms),
        backend=jax.default_backend(),
    )
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
