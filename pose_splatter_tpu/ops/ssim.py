"""SSIM in pure JAX (training loss + eval metric).

Matches the torchmetrics ``StructuralSimilarityIndexMeasure`` defaults used
by the reference (``scripts/training/train_script.py:270``): Gaussian window
(kernel 11, sigma 1.5), k1=0.01, k2=0.03, data_range=1.0, channel-wise
computation with valid ("VALID") convolution and a global mean.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel(kernel_size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)  # [k, k]


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID conv. img: [B, H, W, C]; kernel: [k, k].

    Full f32 precision is forced: TPU convs default to bf16 MXU passes,
    whose 8-bit mantissa destroys the E[x²]−μ² variance estimates (SSIM
    values above 1 on near-constant regions).
    """
    C = img.shape[-1]
    k = kernel[:, :, None, None]  # HWIO with I=1
    k = jnp.tile(k, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        img,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("kernel_size",))
def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over a batch. pred/target: [B, H, W, C] (or [H, W, C])."""
    if pred.ndim == 3:
        pred = pred[None]
        target = target[None]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)

    mu_x = _filter2d(pred, kernel)
    mu_y = _filter2d(target, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y

    sigma_xx = _filter2d(pred * pred, kernel) - mu_xx
    sigma_yy = _filter2d(target * target, kernel) - mu_yy
    sigma_xy = _filter2d(pred * target, kernel) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    return jnp.mean(num / den)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (``scripts/utils/evaluate_model.py:240-243``)."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))
