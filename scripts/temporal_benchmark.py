"""Temporal-sequence render benchmark (BASELINE.json configs[3]).

Renders a 3600-frame sequence at the north-star shape (576x512) through
the FULL eval forward (carve → U-Nets → Gaussian heads → render) and
reports frames/s plus PSNR/SSIM/IoU of the rendered novel view against
the scene oracle. The reference's analog drives ``render_image.py`` once
per frame via subprocess and stitches an MP4
(``/root/reference/scripts/visualization/export_temporal_sequence_rerun.py:25-120``,
``generate_temporal_video.py``); here the per-frame render is one jitted
call and every frame is fetched to host (the export boundary).

The synthetic scene has ``frames`` unique poses; the sequence cycles
through them (``t % frames``), so every one of the 3600 renders is a real
model forward at the target shape, while quality metrics are computed
once per unique pose against the oracle holdout image.

Usage:
  python scripts/synthetic_benchmark.py ... --save-state /tmp/state.pkl
  python scripts/temporal_benchmark.py --state /tmp/state.pkl \
      [--length 3600] [--out TEMPORAL.json]
"""

import argparse
import json
import pickle
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from scripts.synthetic_benchmark import build_model, make_scene
from pose_splatter_tpu.ops.ssim import psnr, ssim
from pose_splatter_tpu.train.losses import iou_loss


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--state", required=True,
                        help="pickle from synthetic_benchmark --save-state")
    parser.add_argument("--length", type=int, default=3600)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    with open(args.state, "rb") as f:
        saved = pickle.load(f)
    sc = saved["scene"]
    C, W, H, g = sc["cameras"], sc["width"], sc["height"], sc["grid"]
    holdout = C - 1
    print(f"Scene: {C} cameras, {W}x{H}, grid {g}, mode {sc['mode']}, "
          f"{sc['frames']} unique poses", file=sys.stderr)
    Ks, Es, frames, centers, angles = make_scene(
        C, H, W, T=sc["frames"],
        radii=tuple(sc.get("radii", (0.10, 0.05, 0.04))))
    model = build_model(C, H, W, g, sc["mode"], crop=sc["crop"],
                        holdout=holdout, anchored=sc.get("anchored", False),
                        min_n=sc.get("min_n", 512), max_n=sc.get("max_n", 8192))
    variables = {"params": jax.device_put(saved["params"]),
                 "batch_stats": jax.device_put(saved["batch_stats"])}

    imgs = frames.astype(np.float32) / 255.0
    masks = np.where(imgs[..., 0] == 1.0, 0.0, 1.0).astype(np.float32)
    obs = [i for i in range(C) if i != holdout]
    T = sc["frames"]

    @jax.jit
    def render_frame(variables, mask, img, p_3d, angle):
        rgb, alpha, _ = model.forward(
            variables, mask, img, p_3d, angle, holdout, train=False)
        return rgb[0], alpha[0]

    payload = [(jnp.asarray(masks[t][obs]), jnp.asarray(imgs[t][obs]),
                jnp.asarray(centers[t]), jnp.asarray(angles[t]))
               for t in range(T)]

    # Warm/compile, then per-unique-pose quality vs the oracle.
    m_psnr, m_ssim, m_iou = [], [], []
    for t in range(T):
        rgb, alpha = render_frame(variables, *payload[t])
        target = jnp.asarray(imgs[t][holdout])
        tmask = jnp.asarray(masks[t][holdout])
        m_psnr.append(float(psnr(rgb, target)))
        m_ssim.append(float(ssim(rgb, target)))
        m_iou.append(float(
            1.0 - iou_loss(jnp.where(alpha > 0.5, 1.0, 0.0), tmask)))

    # Timed sequence: every frame is a full forward + host fetch.
    t0 = time.perf_counter()
    for i in range(args.length):
        rgb, alpha = render_frame(variables, *payload[i % T])
        np.asarray(rgb)  # host fetch = the PNG/MP4 export boundary
    elapsed = time.perf_counter() - t0

    report = {
        "config": f"{W}x{H} grid{g} {sc['mode']} C{C}",
        "sequence_frames": args.length,
        "render_time_s": round(elapsed, 2),
        "frames_per_s": round(args.length / elapsed, 2),
        "ms_per_frame": round(elapsed / args.length * 1e3, 2),
        "holdout_psnr_db": round(float(np.mean(m_psnr)), 2),
        "holdout_ssim": round(float(np.mean(m_ssim)), 4),
        "holdout_iou": round(float(np.mean(m_iou)), 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
