"""3D U-Net with an MLP bottleneck (Flax, NDHWC).

Architecture parity with the reference (``/root/reference/src/unet_3d.py``):

- 5-level encoder, each level = (Conv3x3x3 → BN → LeakyReLU(0.1)) x 2 with
  MaxPool(2) between levels (``unet_3d.py:96-100,120-128``);
- MLP bottleneck flattening ``base_filters*16 x (n/16)³`` → 512 → z_dim and
  back (``unet_3d.py:102-108,144-147``);
- 4-level decoder with transpose-conv upsampling + skip concat
  (``unet_3d.py:110-118,147-163``); final 1x1x1 conv;
- hard input passthrough: the first ``in_channels`` output channels are the
  input (``unet_3d.py:165``);
- every spatial extent must be divisible by 16 (``unet_3d.py:89-91``).

TPU-first choices: channel-last NDHWC layout so XLA maps the 3D convs onto
the MXU; BatchNorm follows torch semantics (momentum 0.1, eps 1e-5).

``init_unet_primary_skip`` mirrors the reference's near-identity init
(``unet_3d.py:12-71``): encoder1/decoder1/final_conv get diagonal delta
kernels for the first ``in_channels`` channels, everything else ~N(0, 1e-4),
biases zero, BN identity.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBlock(nn.Module):
    features: int
    negative_slope: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding=1, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.leaky_relu(x, self.negative_slope)
        return x


def _max_pool3d(x):
    """2x2x2 stride-2 max pool via reshape + reduce-max.

    ``nn.max_pool`` lowers to reduce_window, whose VJP is XLA
    SelectAndScatter — measured ~100 ms *per U-Net backward* at the
    north-star volume on TPU v5e (docs/PERF_r04.md). Non-overlapping
    pooling is a reshape + max over the 8 window taps, whose VJP is
    elementwise compares. Tie gradients split among equal maxima instead
    of torch's first-tap routing (reference ``unet_3d.py:96-100`` uses
    MaxPool3d) — identical forward, measure-zero backward difference for
    post-BN float activations.

    One max per axis keeps every intermediate at rank ≤ 6 (a single
    rank-8 reshape becomes rank 9 under the train step's frame-batch vmap,
    exceeding the TPU XLA rank-8 limit).
    """
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h, w, c).max(axis=2)
    x = x.reshape(b, d // 2, h // 2, 2, w, c).max(axis=3)
    return x.reshape(b, d // 2, h // 2, w // 2, 2, c).max(axis=4)


class Unet3D(nn.Module):
    """x: [B, D, H, W, in_channels] → ([B, D, H, W, out_channels], None)."""

    in_channels: int = 4
    out_channels: int = 8
    base_filters: int = 8
    z_dim: int = 512
    input_size: Tuple[int, int, int] = (80, 80, 48)

    def setup(self):
        bf = self.base_filters
        for s in self.input_size:
            assert s % 16 == 0, f"input extent {s} not divisible by 16"
        self.ns = tuple(s // 16 for s in self.input_size)
        self.n_prod = int(np.prod(self.ns))

        self.encoder1 = ConvBlock(bf, name="encoder1")
        self.encoder2 = ConvBlock(bf * 2, name="encoder2")
        self.encoder3 = ConvBlock(bf * 4, name="encoder3")
        self.encoder4 = ConvBlock(bf * 8, name="encoder4")
        self.encoder5 = ConvBlock(bf * 16, name="encoder5")

        self.mlp_1a = nn.Dense(512, name="mlp_1a")
        self.mlp_1b = nn.Dense(self.z_dim, name="mlp_1b")
        self.mlp_2 = nn.Dense(bf * 16 * self.n_prod, name="mlp_2")

        self.upconv4 = nn.ConvTranspose(bf * 8, (2, 2, 2), strides=(2, 2, 2), name="upconv4")
        self.decoder4 = ConvBlock(bf * 8, name="decoder4")
        self.upconv3 = nn.ConvTranspose(bf * 4, (2, 2, 2), strides=(2, 2, 2), name="upconv3")
        self.decoder3 = ConvBlock(bf * 4, name="decoder3")
        self.upconv2 = nn.ConvTranspose(bf * 2, (2, 2, 2), strides=(2, 2, 2), name="upconv2")
        self.decoder2 = ConvBlock(bf * 2, name="decoder2")
        self.upconv1 = nn.ConvTranspose(bf, (2, 2, 2), strides=(2, 2, 2), name="upconv1")
        self.decoder1 = ConvBlock(bf, name="decoder1")
        self.final_conv = nn.Conv(self.out_channels, (1, 1, 1), name="final_conv")

    def __call__(self, x, train: bool = True):
        b = x.shape[0]
        bf = self.base_filters

        enc1 = self.encoder1(x, train)
        enc2 = self.encoder2(_max_pool3d(enc1), train)
        enc3 = self.encoder3(_max_pool3d(enc2), train)
        enc4 = self.encoder4(_max_pool3d(enc3), train)
        enc5 = self.encoder5(_max_pool3d(enc4), train)

        z = self.mlp_1b(nn.relu(self.mlp_1a(enc5.reshape(b, -1))))
        bottleneck = self.mlp_2(z).reshape(b, *self.ns, bf * 16)

        dec4 = self.upconv4(bottleneck)
        dec4 = self.decoder4(jnp.concatenate([enc4, dec4], axis=-1), train)
        dec3 = self.upconv3(dec4)
        dec3 = self.decoder3(jnp.concatenate([enc3, dec3], axis=-1), train)
        dec2 = self.upconv2(dec3)
        dec2 = self.decoder2(jnp.concatenate([enc2, dec2], axis=-1), train)
        dec1 = self.upconv1(dec2)
        dec1 = self.decoder1(jnp.concatenate([enc1, dec1], axis=-1), train)

        out = self.final_conv(dec1)
        # Hard input passthrough (reference unet_3d.py:165).
        out = jnp.concatenate([x, out[..., self.in_channels :]], axis=-1)
        return out, None


def init_unet_primary_skip(
    params, in_channels: int = 4, small_scale: float = 1e-4, seed: int = 0
):
    """Near-identity re-initialization of a ``Unet3D`` params pytree.

    encoder1/decoder1/final_conv conv kernels: center-tap identity on the
    first ``min(in_channels, in, out)`` channels, ~N(0, small_scale)
    elsewhere; all other convs/dense layers ~N(0, small_scale); biases 0.
    (BN scales/biases are already identity at init.)
    """
    rng = np.random.default_rng(seed)

    def is_primary(path):
        names = "/".join(str(p.key) for p in path)
        return "encoder1" in names or "decoder1" in names or "final_conv" in names

    def reinit(path, leaf):
        names = "/".join(str(p.key) for p in path)
        if "bn" in names:
            return leaf
        key = path[-1].key
        if key == "bias":
            return jnp.zeros_like(leaf)
        if key == "kernel":
            if leaf.ndim == 5 and is_primary(path):
                # Conv kernel [kd, kh, kw, in, out]: center-tap identity.
                kd, kh, kw, cin, cout = leaf.shape
                new = rng.normal(0.0, small_scale, leaf.shape)
                diag_len = min(in_channels, cin, cout)
                for i in range(diag_len):
                    new[kd // 2, kh // 2, kw // 2, i, i] = 1.0
                return jnp.asarray(new, leaf.dtype)
            return jnp.asarray(
                rng.normal(0.0, small_scale, leaf.shape), leaf.dtype
            )
        return leaf

    return jax.tree_util.tree_map_with_path(reinit, params)
