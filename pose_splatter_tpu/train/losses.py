"""Training losses: soft IoU + masked L1 + SSIM.

Parity with the reference (``/root/reference/scripts/training/train_script.py``):

- ``iou_loss``      — ``train_script.py:30-36``: soft IoU between rendered
  alpha and the target silhouette, summed over the last two axes.
- ``masked_l1_loss``— ``train_script.py:130``: ``|img - rgb|.sum() / mask.sum()``.
- ``ssim`` term     — ``train_script.py:129``: ``ssim_lambda * (1 - SSIM)``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from pose_splatter_tpu.ops.ssim import ssim


def iou_loss(predicted_mask: jnp.ndarray, target_mask: jnp.ndarray, eps: float = 1e-6):
    """Soft IoU loss. Shapes must match; reduces over the last two axes,
    then means any leading axes."""
    intersection = (predicted_mask * target_mask).sum(axis=(-2, -1))
    union = (
        predicted_mask + target_mask - predicted_mask * target_mask
    ).sum(axis=(-2, -1))
    iou = (intersection + eps) / (union + eps)
    return 1.0 - iou.mean()


def masked_l1_loss(pred_img: jnp.ndarray, target_img: jnp.ndarray, target_mask: jnp.ndarray):
    """Sum of absolute error normalized by the mask area."""
    return jnp.abs(target_img - pred_img).sum() / jnp.maximum(target_mask.sum(), 1.0)


def total_loss(
    rgb: jnp.ndarray,
    alpha: jnp.ndarray,
    target_img: jnp.ndarray,
    target_mask: jnp.ndarray,
    img_lambda: float,
    ssim_lambda: float,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """rgb [H,W,3], alpha [H,W], target_img [H,W,3], target_mask [H,W]."""
    l_iou = iou_loss(alpha, target_mask)
    l_ssim = ssim_lambda * (1.0 - ssim(rgb, target_img))
    l_img = img_lambda * masked_l1_loss(rgb, target_img, target_mask)
    total = l_iou + l_ssim + l_img
    return total, {"iou": l_iou, "ssim": l_ssim, "img": l_img, "total": total}
