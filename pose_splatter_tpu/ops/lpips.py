"""LPIPS perceptual metric (AlexNet backbone) in Flax.

The reference treats LPIPS as optional (torchmetrics + AlexNet, skipped when
unavailable; ``scripts/training/evaluate_model.py:20-27``). Same policy here:
the AlexNet feature trunk + per-layer linear heads are implemented in Flax,
and the pretrained weights must be supplied as a file (either a converted
``.npz`` or the ``lpips`` package's torch checkpoint + torchvision AlexNet
state dict) — there is no network egress to download them. Without weights,
``create_lpips`` returns None and callers skip the metric, exactly like the
reference.

LPIPS(x, y) = Σ_l w_l · mean_hw || normalize(f_l(x)) − normalize(f_l(y)) ||²
with inputs scaled to [-1, 1] and the standard shift/scale normalization.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# LPIPS input normalization (matches the official implementation).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet conv trunk configuration: (features, kernel, stride, padding).
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# Max-pool after these conv indices.
_POOL_AFTER = {0, 1}


class AlexNetFeatures(nn.Module):
    """Returns the 5 post-ReLU conv feature maps (LPIPS taps)."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (f, k, s, p) in enumerate(_ALEX_CFG):
            x = nn.Conv(f, (k, k), strides=s, padding=p, name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(feats_x: Sequence[jnp.ndarray],
                   feats_y: Sequence[jnp.ndarray],
                   lin_weights: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-layer unit-normalize, squared diff, 1x1 linear head, spatial mean."""
    total = 0.0
    for fx, fy, w in zip(feats_x, feats_y, lin_weights):
        d = (_normalize_tensor(fx) - _normalize_tensor(fy)) ** 2
        # w: [C] nonnegative head weights (1x1 conv with no bias).
        total = total + jnp.mean(jnp.sum(d * w.reshape(1, 1, 1, -1), axis=-1),
                                 axis=(1, 2))
    return total  # [B]


def load_weights(path: str) -> Dict[str, Any]:
    """Load converted ``.npz`` weights, or convert from torch checkpoints.

    For torch: pass a path to a directory containing ``alexnet.pth``
    (torchvision AlexNet state dict) and ``lpips_alex.pth`` (the lpips
    package's linear heads).
    """
    import os

    if path.endswith(".npz"):
        d = dict(np.load(path))
        params: Dict[str, Any] = {}
        lins = []
        for i in range(5):
            params[f"conv{i}"] = {
                "kernel": jnp.asarray(d[f"conv{i}_kernel"]),
                "bias": jnp.asarray(d[f"conv{i}_bias"]),
            }
            lins.append(jnp.asarray(d[f"lin{i}"]))
        return {"params": params, "lins": lins}

    import torch

    alex_sd = torch.load(os.path.join(path, "alexnet.pth"),
                         map_location="cpu", weights_only=True)
    lin_sd = torch.load(os.path.join(path, "lpips_alex.pth"),
                        map_location="cpu", weights_only=True)
    params = {}
    torch_idx = [0, 3, 6, 8, 10]
    for i, ti in enumerate(torch_idx):
        w = alex_sd[f"features.{ti}.weight"].numpy()  # OIHW
        b = alex_sd[f"features.{ti}.bias"].numpy()
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    lins = []
    for i in range(5):
        w = lin_sd[f"lin{i}.model.1.weight"].numpy()  # [1, C, 1, 1]
        lins.append(jnp.asarray(np.abs(w.reshape(-1))))
    return {"params": params, "lins": lins}


def create_lpips(weights_path: Optional[str] = None):
    """Returns lpips(x, y) over [B,H,W,3] images in [0,1], or None when no
    weights are available (callers skip the metric, as the reference does)."""
    if weights_path is None:
        return None
    try:
        weights = load_weights(weights_path)
    except Exception as e:  # pragma: no cover
        print(f"LPIPS weights unavailable ({e}); skipping metric")
        return None

    model = AlexNetFeatures()
    variables = {"params": weights["params"]}
    lins = weights["lins"]

    @jax.jit
    def lpips(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        def prep(img):
            img = 2.0 * img - 1.0
            return (img - _SHIFT) / _SCALE

        fx = model.apply(variables, prep(x))
        fy = model.apply(variables, prep(y))
        return lpips_distance(fx, fy, lins)

    return lpips
