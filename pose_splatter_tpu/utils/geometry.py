"""Core geometry: voxel grids, pinhole projection, rotations, quaternions.

JAX-first, fully jittable and vmappable. Static-shape semantics match the
reference's NumPy/torch geometry layer:

- ``create_3d_grid``   — ``src/shape_carving.py:10-18``: n³ lattice spanning
  ``[-ell/2, ell/2]`` per axis, ``ij`` indexing, optional ``volume_idx`` crop.
- ``project_points``   — ``src/shape_carving.py:21-30`` / torch mirror
  ``src/shape_carver.py:53-94``: ``x_pix = K [R|t] X / z`` with the
  reference's ``z + 1e-8`` normalization (batched path) — kept bit-for-bit.
- ``yaw_rotation``     — the z-axis rotation used for per-frame pose
  (``src/shape_carver.py:376-381``, ``src/model.py:277-287``).
- quaternion helpers   — the pose transform composes a yaw with predicted
  quaternions. The reference does a float64 quat→matrix→eigh→quat round trip
  (``src/model.py:368-421``); here the identical rotation is computed by
  direct quaternion multiplication (cheaper, same result up to sign; the
  returned quaternion is canonicalized to w >= 0 like the reference).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def create_3d_grid(
    length: float, n: int, volume_idx: Optional[Sequence[Sequence[int]]] = None
) -> np.ndarray:
    """n×n×n lattice of 3D points spanning ``[-length/2, length/2]``,
    optionally cropped to ``volume_idx`` ranges. Returns [n1,n2,n3,3] f32.

    Host-side NumPy (grid is a static model constant).
    """
    offset = np.linspace(-length / 2, length / 2, n)
    gx, gy, gz = np.meshgrid(offset, offset, offset, indexing="ij")
    grid = np.stack([gx, gy, gz], axis=-1)
    if volume_idx is not None:
        (i1, i2), (i3, i4), (i5, i6) = volume_idx
        grid = grid[i1:i2, i3:i4, i5:i6]
    return grid.astype(np.float32)


def project_points(
    points: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
    eps: float = 1e-8,
    clamp_z: bool = False,
) -> jnp.ndarray:
    """Project world points into pixel coordinates for a batch of cameras.

    Args:
        points:     [N, 3] world points.
        intrinsics: [C, 3, 3] (or [3, 3]).
        extrinsics: [C, 4, 4] (or [4, 4]) world→camera.
        clamp_z:    if True, normalize by ``max(z, eps)`` (reference
                    single-camera path ``shape_carver.py:233``); otherwise by
                    ``z + eps`` (reference batched path ``shape_carver.py:92``).

    Returns:
        [C, N, 2] (or [N, 2] if unbatched cameras) pixel coordinates (x, y).
    """
    squeeze = intrinsics.ndim == 2
    K = jnp.atleast_3d(intrinsics).reshape(-1, 3, 3)
    E = extrinsics.reshape(-1, 4, 4)
    pts_h = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)  # [N,4]
    cam = jnp.einsum("cij,nj->cni", E, pts_h)[..., :3]  # [C,N,3]
    pix_h = jnp.einsum("cij,cnj->cni", K, cam)  # [C,N,3]
    z = pix_h[..., 2:3]
    denom = jnp.maximum(z, eps) if clamp_z else z + eps
    pix = pix_h[..., :2] / denom
    if squeeze:
        pix = pix[0]
    return pix


def camera_positions(extrinsics: jnp.ndarray) -> jnp.ndarray:
    """World-space camera centers ``-Rᵀ t`` for [C,4,4] extrinsics."""
    R = extrinsics[..., :3, :3]
    t = extrinsics[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def yaw_rotation(angle) -> jnp.ndarray:
    """[3,3] rotation about +z by ``angle`` (radians)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def transform_grid(grid: jnp.ndarray, center: jnp.ndarray, angle) -> jnp.ndarray:
    """Yaw-rotate then shift a [n1,n2,n3,3] grid (``shape_carver.py:376-381``)."""
    rot = yaw_rotation(angle)
    out = jnp.einsum("abci,ji->abcj", grid, rot)
    return out + center.reshape(1, 1, 1, 3)


# ----------------------------------------------------------------------------
# Quaternions (w, x, y, z convention — matches gsplat / the reference MLP head)
# ----------------------------------------------------------------------------

def quat_normalize(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, broadcasting over leading dims. (w,x,y,z)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[...,4] unit quaternion → [...,3,3] rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], -1),
        jnp.stack([r10, r11, r12], -1),
        jnp.stack([r20, r21, r22], -1),
    ], -2)


def yaw_quat(angle) -> jnp.ndarray:
    """Unit quaternion for a rotation about +z by ``angle``."""
    half = 0.5 * jnp.asarray(angle)
    c, s = jnp.cos(half), jnp.sin(half)
    z = jnp.zeros_like(c)
    return jnp.stack([c, z, z, s], -1)


def rotate_quats_by_yaw(quats: jnp.ndarray, angle) -> jnp.ndarray:
    """Left-compose a z-rotation onto [N,4] quaternions and canonicalize
    the sign to w >= 0 (matching ``src/model.py:419-421``).

    Equivalent rotation to the reference's float64 matrix round trip
    (``src/model.py:284-287``) computed directly.
    """
    q_yaw = yaw_quat(angle)
    out = quat_multiply(q_yaw[None, :], quat_normalize(quats))
    sign = jnp.where(out[..., :1] < 0, -1.0, 1.0)
    return out * sign
