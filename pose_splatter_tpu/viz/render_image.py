"""Novel-view rendering with pose offsets (full-resolution).

Parity with ``/root/reference/scripts/visualization/render_image.py:21-174``:
camera parameters are loaded at BOTH the training downsample and ds=1 so the
render is full resolution; the frame's Gaussians are built (carve → U-Nets →
head), yaw+center transformed to world space, then a user ``angle_offset``
is applied about the Gaussian centroid and optional ``delta_xyz`` shift
before splatting through the chosen view's full-res intrinsics. This is the
engine behind the 360°/multiview/temporal video drivers
(``generate_360_rotation.py``, ``generate_multiview.py``,
``generate_temporal_video.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pose_splatter_tpu.utils.geometry import yaw_rotation


def render_novel_view(
    model,
    variables,
    mask,
    img,
    p_3d,
    angle: float,
    view: int,
    K_full: np.ndarray,  # [C,3,3] full-resolution intrinsics
    width: int,
    height: int,
    angle_offset: float = 0.0,
    delta_xyz: Sequence[float] = (0.0, 0.0, 0.0),
    radius_clip: float = 2.0,
) -> np.ndarray:
    """Render one frame from camera ``view`` at full resolution.

    Returns an RGB float image [height, width, 3] in [0, 1].
    """

    @jax.jit
    def run(variables, mask, img, p_3d, angle, angle_offset, delta):
        volume = model.carve(mask, img, p_3d, angle)
        volume = jnp.transpose(volume, (1, 2, 3, 0))[None]
        vol_flat = model.net.apply(variables, volume, False,
                                   method="process_volume")
        g = model.gaussians_from_volume(variables, vol_flat, train=False)

        # World transform: frame yaw + center.
        means = g["means"] @ yaw_rotation(angle).T + p_3d
        # User offset about the centroid.
        centroid = jnp.mean(means, axis=0, keepdims=True)
        means = (means - centroid) @ yaw_rotation(angle_offset).T + centroid
        means = means + delta

        rgb, _ = model.splat(
            means,
            g["quats"],
            jnp.exp(g["log_scales"]),
            jax.nn.sigmoid(g["logit_opacities"]),
            g["colors"],
            jnp.asarray(model.viewmats)[view][None],
            jnp.asarray(K_full, jnp.float32)[view][None],
            width,
            height,
            valid=g["valid"],
            radius_clip=radius_clip,
        )
        return rgb[0]

    rgb = run(
        variables, jnp.asarray(mask), jnp.asarray(img), jnp.asarray(p_3d),
        jnp.float32(angle), jnp.float32(angle_offset),
        jnp.asarray(delta_xyz, jnp.float32),
    )
    return np.asarray(jnp.clip(rgb, 0.0, 1.0))


def render_turntable(model, variables, mask, img, p_3d, angle, view,
                     K_full, width, height, n_steps: int = 36):
    """36-step 360° yaw sweep (generate_360_rotation.py contract)."""
    frames = []
    for k in range(n_steps):
        offset = 2 * np.pi * k / n_steps
        frames.append(
            render_novel_view(model, variables, mask, img, p_3d, angle,
                              view, K_full, width, height,
                              angle_offset=offset)
        )
    return np.stack(frames)
