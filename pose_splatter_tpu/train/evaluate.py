"""Evaluation pipeline: render the test split + per-camera image metrics.

Parity with the reference's working eval path
(``/root/reference/scripts/utils/evaluate_model.py``):

- ``render_images`` — renders ALL C views per frame in one jitted forward
  (``:80-149``; view batch = the rasterizer's camera batch), buffers 50
  frames, writes uint8 RGBA to ``rendered_images.h5`` (gzip) at the test
  split's offset within the full timeline.
- ``calculate_image_metrics`` — compares predictions vs the GT images.h5 in
  batches computing per-camera **l1, iou (α>0.5), soft_iou, psnr, ssim** →
  tab-headed ``metrics_test.csv`` (``:152-227``), plus an
  ``evaluation_metrics.json`` summary (means across cameras; the shape of
  ``scripts/training/evaluate_model.py:158-188``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pose_splatter_tpu.ops.ssim import psnr as psnr_fn
from pose_splatter_tpu.ops.ssim import ssim as ssim_fn

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def render_images(
    model,
    variables,
    dataset_test,
    total_num_frames: int,
    render_fn: str,
    compression_level: int = 2,
    write_batch_frames: int = 50,
    progress: bool = True,
) -> str:
    """Render every test frame to all C cameras; write RGBA uint8 HDF5."""
    C = model.num_cameras
    H, W = model.H, model.W
    num_frames = len(dataset_test)
    offset = total_num_frames - num_frames
    view_idx = jnp.arange(C)
    # Adaptive models must evaluate with the same per-frame temp_K / seed
    # the training forward used (the reference recomputes it inside every
    # forward, src/shape_carver.py:328-347).
    adaptive_fn = model.make_adaptive_fn() if model.adaptive_camera else None

    @jax.jit
    def forward(variables, mask, img, p_3d, angle, K_mask=None,
                carve_center=None):
        rgb, alpha, _ = model.forward(
            variables, mask, img, p_3d, angle, view_idx, train=False,
            K_mask=K_mask, carve_center=carve_center,
        )
        rgba = jnp.concatenate([rgb, alpha[..., None]], -1)
        return jnp.clip(rgba, 0.0, 1.0)

    with h5py.File(render_fn, "w") as hdf:
        dset = hdf.create_dataset(
            "images",
            (total_num_frames, C, H, W, 4),
            dtype="uint8",
            compression="gzip",
            compression_opts=compression_level,
        )
        buffer = []
        local = 0
        for i in range(num_frames):
            mask, img, p_3d, angle, _ = dataset_test.get(i, view_idx=0)
            kw = {}
            if adaptive_fn is not None:
                temp_K, seed = adaptive_fn(mask)
                kw = dict(K_mask=jnp.asarray(temp_K, jnp.float32),
                          carve_center=jnp.asarray(seed, jnp.float32))
            rgba = forward(
                variables, jnp.asarray(mask), jnp.asarray(img),
                jnp.asarray(p_3d), jnp.float32(angle), **kw,
            )
            buffer.append((255 * np.asarray(rgba)).astype(np.uint8))
            if len(buffer) >= write_batch_frames:
                dset[offset + local : offset + local + len(buffer)] = np.array(buffer)
                local += len(buffer)
                buffer = []
                if progress:
                    print(f"  rendered {local}/{num_frames}")
        if buffer:
            dset[offset + local : offset + local + len(buffer)] = np.array(buffer)
    return render_fn


def _get_iou(pred_mask, gt_mask, eps=1e-6):
    intersection = (pred_mask * gt_mask).sum(axis=(-2, -1))
    union = (pred_mask + gt_mask - pred_mask * gt_mask).sum(axis=(-2, -1))
    return (intersection + eps) / (union + eps)


@jax.jit
def _batch_metrics(gt_img, pred_img, pred_alpha):
    """gt/pred [b,C,h,w,3], alpha [b,C,h,w] → dict of per-camera sums [C]."""
    mask = jnp.where(gt_img[..., 0] == 1.0, 0.0, 1.0)  # [b,C,h,w]
    l1 = jnp.abs(gt_img - pred_img).sum(axis=(-3, -2, -1)) / jnp.maximum(
        mask.sum(axis=(-2, -1)), 1.0
    )
    iou = _get_iou(jnp.where(pred_alpha > 0.5, 1.0, 0.0), mask)
    soft_iou = _get_iou(pred_alpha, mask)
    mse = ((gt_img - pred_img) ** 2).mean(axis=(-3, -2, -1))
    psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))

    b, C = gt_img.shape[:2]
    flat_p = pred_img.reshape((-1,) + pred_img.shape[2:])
    flat_g = gt_img.reshape((-1,) + gt_img.shape[2:])
    ssim_vals = jax.vmap(lambda p, g: ssim_fn(p, g))(flat_p, flat_g)
    ssim = ssim_vals.reshape(b, C)

    return {
        "l1": l1.sum(axis=0),
        "iou": iou.sum(axis=0),
        "soft_iou": soft_iou.sum(axis=0),
        "psnr": psnr.sum(axis=0),
        "ssim": ssim.sum(axis=0),
    }


def calculate_image_metrics(
    pred_fn: str,
    gt_fn: str,
    metrics_fn: str,
    batch_size: int = 32,
    split: str = "test",
    progress: bool = True,
) -> Dict[str, np.ndarray]:
    """Per-camera metric table over a split; writes ``metrics_fn`` CSV."""
    assert split in ("train", "valid", "test")
    with h5py.File(pred_fn, "r") as pf, h5py.File(gt_fn, "r") as gf:
        pred_images = pf["images"]
        gt_images = gf["images"]
        assert pred_images.shape[:-1] == gt_images.shape[:-1]
        C = pred_images.shape[1]

        a1, a2 = 0, len(gt_images) // 3
        a3, a4 = 2 * a2, len(gt_images)
        i1, i2 = {"train": (a1, a2), "valid": (a2, a3), "test": (a3, a4)}[split]

        metrics = {k: np.zeros(C) for k in ("l1", "iou", "soft_iou", "ssim", "psnr")}
        for start in range(i1, i2, batch_size):
            end = min(start + batch_size, i2)
            gt = jnp.asarray(gt_images[start:end], jnp.float32) / 255.0
            pred = jnp.asarray(pred_images[start:end], jnp.float32) / 255.0
            sums = _batch_metrics(gt[..., :3], pred[..., :3], pred[..., 3])
            for k in metrics:
                metrics[k] += np.asarray(sums[k])
            if progress:
                print(f"  metrics: {end - i1}/{i2 - i1}")

        for k in metrics:
            metrics[k] = metrics[k] / (i2 - i1)

    sorted_keys = sorted(metrics.keys())
    data = np.column_stack([metrics[k] for k in sorted_keys])
    header = "\t".join(sorted_keys)
    np.savetxt(metrics_fn, data, delimiter=",", header=header, fmt="%.6f")
    return metrics


def calculate_lpips_metric(
    pred_fn: str,
    gt_fn: str,
    weights_path: str,
    split: str = "test",
    batch_size: int = 8,
) -> Optional[np.ndarray]:
    """Optional per-camera LPIPS over a split (reference keeps LPIPS
    optional, ``scripts/training/evaluate_model.py:20-27``). Returns [C]
    means or None if weights are unavailable."""
    from pose_splatter_tpu.ops.lpips import create_lpips

    lpips = create_lpips(weights_path)
    if lpips is None:
        return None
    with h5py.File(pred_fn, "r") as pf, h5py.File(gt_fn, "r") as gf:
        pred_images = pf["images"]
        gt_images = gf["images"]
        C = pred_images.shape[1]
        a1, a2 = 0, len(gt_images) // 3
        a3, a4 = 2 * a2, len(gt_images)
        i1, i2 = {"train": (a1, a2), "valid": (a2, a3), "test": (a3, a4)}[split]
        total = np.zeros(C)
        for start in range(i1, i2, batch_size):
            end = min(start + batch_size, i2)
            gt = jnp.asarray(gt_images[start:end, ..., :3], jnp.float32) / 255.0
            pred = jnp.asarray(pred_images[start:end, ..., :3], jnp.float32) / 255.0
            b = end - start
            vals = lpips(pred.reshape((-1,) + pred.shape[2:]),
                         gt.reshape((-1,) + gt.shape[2:]))
            total += np.asarray(vals.reshape(b, C).sum(axis=0))
        return total / (i2 - i1)


def write_evaluation_summary(metrics: Dict[str, np.ndarray], out_fn: str,
                             extra: Optional[Dict] = None) -> str:
    """Camera-averaged JSON summary (evaluation_metrics.json shape)."""
    summary = {
        k: {
            "mean": float(np.mean(v)),
            "per_camera": [float(x) for x in np.asarray(v).ravel()],
        }
        for k, v in metrics.items()
    }
    if extra:
        summary.update(extra)
    with open(out_fn, "w") as f:
        json.dump(summary, f, indent=2)
    return out_fn
