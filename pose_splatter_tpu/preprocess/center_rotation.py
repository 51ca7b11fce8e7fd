"""Per-frame center + yaw estimation (preprocessing step 2).

Pipeline parity (``/root/reference/scripts/preprocessing/calculate_center_rotation.py``):
per frame — binarized masks → rough 3D center (weighted-median triangulation,
or adaptive principal-point seed) → binary carve at ``(C-1)/C`` on an
``ell_tracking`` grid → volume-weighted mean + covariance; then
``track_principal_axes`` (OT sign continuity) → yaw angles; saved as
``center_rotation.npz{centers, angles, covs}``.

TPU-native redesign: the reference runs the carve on CPU under joblib
(1-2 h for the full dataset). Here video decode stays host-side but the
carve + moments run on-device as one jitted, frame-batched computation
(``_carve_moments_batch``) — the grid-projection matmul and mask gather are
exactly the training carver's (``ops/carving.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pose_splatter_tpu.ops.carving import get_volume
from pose_splatter_tpu.tracking import track_principal_axes
from pose_splatter_tpu.utils.cameras import (
    adjust_principal_points_to_seed,
    get_cam_params,
    get_rough_center_3d,
)
from pose_splatter_tpu.utils.geometry import create_3d_grid


def mean_and_covariance_3d(volume: jnp.ndarray, coords: jnp.ndarray):
    """Volume-weighted spatial mean and covariance.

    volume [n,n,n] nonnegative; coords [n,n,n,3] → (mean [3], cov [3,3]).
    (``calculate_center_rotation.py:28-54``.)
    """
    total = jnp.maximum(volume.sum(), 1e-12)
    weights = volume / total
    mean = jnp.sum(coords * weights[..., None], axis=(0, 1, 2))
    centered = coords - mean
    cov = jnp.einsum("ijkl,ijk,ijkm->lm", centered, weights, centered)
    return mean, cov


@partial(jax.jit, static_argnames=("carve_threshold",))
def _carve_moments_batch(
    masks: jnp.ndarray,  # [B, C, h, w]
    centers: jnp.ndarray,  # [B, 3] rough shifts
    grid: jnp.ndarray,  # [n, n, n, 3]
    Ks: jnp.ndarray,  # [C, 3, 3] (or [B, C, 3, 3] when adaptive)
    Es: jnp.ndarray,  # [C, 4, 4]
    carve_threshold: float,
):
    """Batched binary carve + moments on device."""
    per_frame_K = Ks.ndim == 4

    def one(mask, center, K):
        g = grid + center.reshape(1, 1, 1, 3)
        vol = get_volume(mask[..., None], K, Es, g)[0]  # [n,n,n]
        binary = (vol >= carve_threshold).astype(jnp.float32)
        return mean_and_covariance_3d(binary, g)

    if per_frame_K:
        return jax.vmap(one)(masks, centers, Ks)
    return jax.vmap(lambda m, c: one(m, c, Ks))(masks, centers)


def calculate_center_rotation(
    config,
    device_batch: int = 16,
    progress: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full step-2 pipeline. Returns (centers [T,3], angles [T], covs [T,3,3])
    and writes ``config.center_rotation_fn``."""
    from pose_splatter_tpu.preprocess.video import (
        iter_mask_frames,
        video_frame_count,
    )

    holdout = config.holdout_views
    mask_fns = [
        fn for i, fn in enumerate(config.mask_video_fns) if i not in holdout
    ]
    intrinsic, extrinsic, Ps = get_cam_params(
        config.camera_fn,
        ds=config.image_downsample,
        auto_orient=True,
        load_up_direction=not config.adaptive_camera,
        up_fn=config.vertical_lines_fn,
    )
    obs = np.array([i for i in range(len(Ps)) if i not in holdout], dtype=int)
    intrinsic, extrinsic, Ps = intrinsic[obs], extrinsic[obs], Ps[obs]
    C = len(Ps)

    grid = jnp.asarray(create_3d_grid(config.ell_tracking, config.grid_size))
    Es = jnp.asarray(extrinsic, jnp.float32)
    K_static = jnp.asarray(intrinsic, jnp.float32)
    thresh = (C - 1.0) / C

    total = video_frame_count(mask_fns[0])
    frame_indices = np.arange(0, total, config.frame_jump)

    centers_out, covs_out = [], []
    buf_masks, buf_centers, buf_Ks = [], [], []

    def flush():
        if not buf_masks:
            return
        masks_b = jnp.asarray(np.stack(buf_masks))
        centers_b = jnp.asarray(np.stack(buf_centers), jnp.float32)
        if config.adaptive_camera:
            Ks_b = jnp.asarray(np.stack(buf_Ks), jnp.float32)
        else:
            Ks_b = K_static
        means, covs = _carve_moments_batch(
            masks_b, centers_b, grid, Ks_b, Es, carve_threshold=thresh
        )
        centers_out.append(np.asarray(means))
        covs_out.append(np.asarray(covs))
        buf_masks.clear()
        buf_centers.clear()
        buf_Ks.clear()

    it = iter_mask_frames(
        mask_fns, frame_indices, config.frame_jump, config.image_downsample
    )
    for i, (frame_idx, masks) in enumerate(it):
        if config.adaptive_camera:
            temp_K, p_3d = adjust_principal_points_to_seed(
                masks, intrinsic, extrinsic
            )
            buf_Ks.append(temp_K)
        else:
            p_3d = get_rough_center_3d(masks, Ps)
        buf_masks.append(masks)
        buf_centers.append(p_3d)
        if len(buf_masks) == device_batch:
            flush()
            if progress and (i + 1) % (device_batch * 8) == 0:
                print(f"  center/rotation: {i + 1}/{len(frame_indices)} frames")
    flush()

    centers = np.concatenate(centers_out)
    covs = np.concatenate(covs_out)
    axes = track_principal_axes(centers, covs)
    angles = np.angle(axes[:, 0] + 1j * axes[:, 1])

    np.savez(config.center_rotation_fn, centers=centers, angles=angles, covs=covs)
    return centers, angles, covs
