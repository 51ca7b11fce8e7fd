"""ResNet-18 feature extractor in Flax (NHWC).

Used by the visual-pose-embedding pipeline
(``/root/reference/scripts/preprocessing/calculate_visual_features.py:224-228``:
torchvision ResNet18, ImageNet weights, truncated before the FC → [B, 512]
features). This is the TPU equivalent: standard ResNet-18 topology
(conv7x7/2 → maxpool/2 → 4 stages of 2 BasicBlocks → global average pool).

ImageNet weights are not bundled (no network egress); supply them via
``load_torch_state_dict`` (converts a torch ``resnet18`` state dict, e.g. a
downloaded ``resnet18-f37072fd.pth``) or a previously converted ``.npz``.
Random init still produces deterministic (untrained) features so the
pipeline is runnable end-to-end.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """Feature extractor: [B, H, W, 3] → [B, 512] (global-avg-pooled)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (n_blocks, feats) in enumerate(
            zip(self.stage_sizes, self.features)
        ):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(feats, strides,
                               name=f"layer{stage + 1}_{block}")(x, train)
        return x.mean(axis=(1, 2))  # [B, 512]


def preprocess_imagenet(rgb: jnp.ndarray) -> jnp.ndarray:
    """Normalize [.., H, W, 3] images in [0,1] with ImageNet statistics
    (``calculate_visual_features.py:228``)."""
    return (rgb - IMAGENET_MEAN) / IMAGENET_STD


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Convert a torchvision ``resnet18`` checkpoint (.pth state dict or a
    converted .npz) into this module's Flax variables."""
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        sd = {k: v for k, v in flat.items()}
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(
            path, map_location="cpu", weights_only=True).items()}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path_keys, value):
        node = tree
        for k in path_keys[:-1]:
            node = node.setdefault(k, {})
        node[path_keys[-1]] = jnp.asarray(value)

    def conv(torch_key, flax_path):
        # torch OIHW → flax HWIO
        put(params, flax_path + ("kernel",), sd[torch_key].transpose(2, 3, 1, 0))

    def bn(torch_prefix, flax_path):
        put(params, flax_path + ("scale",), sd[torch_prefix + ".weight"])
        put(params, flax_path + ("bias",), sd[torch_prefix + ".bias"])
        put(stats, flax_path + ("mean",), sd[torch_prefix + ".running_mean"])
        put(stats, flax_path + ("var",), sd[torch_prefix + ".running_var"])

    conv("conv1.weight", ("conv1",))
    bn("bn1", ("bn1",))
    for stage in range(1, 5):
        for block in range(2):
            t = f"layer{stage}.{block}"
            f = f"layer{stage}_{block}"
            conv(f"{t}.conv1.weight", (f, "conv1"))
            bn(f"{t}.bn1", (f, "bn1"))
            conv(f"{t}.conv2.weight", (f, "conv2"))
            bn(f"{t}.bn2", (f, "bn2"))
            if f"{t}.downsample.0.weight" in sd:
                conv(f"{t}.downsample.0.weight", (f, "downsample_conv"))
                bn(f"{t}.downsample.1", (f, "downsample_bn"))

    return {"params": params, "batch_stats": stats}


def create_feature_extractor(weights_path: Optional[str] = None, rng=None):
    """Returns (apply_fn: [B,H,W,3]→[B,512], variables)."""
    model = ResNet18()
    if weights_path:
        variables = load_torch_state_dict(weights_path)
    else:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        variables = model.init(rng, jnp.zeros((1, 224, 224, 3)), train=False)

    def apply_fn(rgb):
        return model.apply(variables, preprocess_imagenet(rgb), False)

    return apply_fn, variables
