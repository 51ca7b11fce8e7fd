"""Camera loading and multi-view geometry (host-side, NumPy).

Behavioral parity targets (all file:line refs into /root/reference):

- ``get_cam_params``          — ``src/utils.py:56-112``: load HDF5 camera
  parameters, downsample-scale intrinsics, auto-orient the world so the
  estimated up-direction maps to +z (Rodrigues), recenter to the mean camera
  position, and rescale so the farthest camera sits at distance 1.
- ``rotation_matrix_between`` — ``src/utils.py:23-53``.
- ``triangulate_points``      — ``src/utils.py:134-168`` (two-view 6x6 SVD).
- ``triangulate_and_reproject``— ``src/utils.py:171-203`` (pairwise DLT,
  median aggregation).
- ``get_rough_center_3d``     — ``src/utils.py:12-20`` (weighted-median of
  mask marginals per view, then triangulation).
- ``adjust_principal_points_to_seed`` — ``src/shape_carving.py:173-255``
  (adaptive-camera principal-point re-centering).

These run on the host (they are per-frame scalar work feeding the jitted
TPU pipeline), so they stay NumPy by design.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def rotation_matrix_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation matrix taking unit direction ``a`` to ``b`` (Rodrigues)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    eps = 1e-6
    if np.sum(np.abs(v)) < eps:
        # Parallel vectors: pick any perpendicular axis.
        x = np.array([1.0, 0, 0]) if abs(a[0]) < eps else np.array([0, 1.0, 0])
        v = np.cross(a, x)
    v = v / np.linalg.norm(v)
    skew = np.array([
        [0, -v[2], v[1]],
        [v[2], 0, -v[0]],
        [-v[1], v[0], 0],
    ])
    theta = np.arccos(np.clip(np.dot(a, b), -1, 1))
    return np.eye(3) + np.sin(theta) * skew + (1 - np.cos(theta)) * (skew @ skew)


def get_cam_params(
    cam_fn: str,
    ds: int = 1,
    auto_orient: bool = True,
    load_up_direction: bool = True,
    up_fn: str = "vertical_lines.npz",
    holdout_views: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load camera parameters from HDF5 and optionally re-orient the world.

    Returns ``(intrinsic [C,3,3], extrinsic [C,4,4], Ps [C,3,4])``.
    """
    if h5py is None:
        raise ImportError("h5py is required to load camera parameters")
    with h5py.File(cam_fn, "r") as f:
        grp = f["camera_parameters"]
        rotation = np.array(grp["rotation"])
        translation = np.array(grp["translation"])
        intrinsic = np.array(grp["intrinsic"]).astype(np.float64)

    extrinsic = np.stack([np.eye(4) for _ in range(len(intrinsic))], 0)
    extrinsic[:, :3, :3] = rotation
    extrinsic[:, :3, -1] = translation

    if auto_orient and load_up_direction:
        assert os.path.exists(up_fn), f"up-direction file not found: {up_fn}"
        up = -np.load(up_fn)["up"]

    if ds != 1:
        intrinsic[..., 0, 0] /= ds
        intrinsic[..., 1, 1] /= ds
        intrinsic[..., 0, 2] /= ds
        intrinsic[..., 1, 2] /= ds

    if auto_orient:
        R = rotation
        if not load_up_direction:
            up = np.mean(extrinsic[:, :3, 1], axis=0)
            up = up / np.linalg.norm(up)
        R_2 = rotation_matrix_between(np.array([0, 0, 1.0]), up)
        mean_translation = np.mean(
            np.transpose(R, (0, 2, 1)) @ translation[..., None], axis=0
        )
        rotation = R @ R_2.T[None]
        translation = (R @ mean_translation.reshape(1, 3, 1))[..., 0] + translation
        extrinsic = np.stack([np.eye(4) for _ in range(len(intrinsic))], 0)
        positions = np.stack(
            [np.linalg.solve(r, e) for r, e in zip(rotation, translation)], 0
        )
        scale_factor = 1.0 / np.max(np.linalg.norm(positions, axis=1))
        translation = scale_factor * translation
        extrinsic[:, :3, :3] = rotation
        extrinsic[:, :3, -1] = translation

    KR = intrinsic @ rotation
    Kt = intrinsic @ translation[..., None]
    Ps = np.concatenate([KR, Kt], axis=-1)

    if holdout_views is not None:
        obs = np.array(
            [i for i in range(len(Ps)) if i not in holdout_views], dtype=int
        )
        intrinsic, extrinsic, Ps = intrinsic[obs], extrinsic[obs], Ps[obs]

    return intrinsic, extrinsic, Ps


def w2c_to_c2w(w2c: np.ndarray) -> np.ndarray:
    """World-to-camera → camera-to-world in the reference's viewer
    convention (``src/utils.py:115-120``)."""
    c2w = np.linalg.inv(w2c)
    c2w[:, 0:3, 1:3] *= -1
    c2w = c2w[:, np.array([1, 0, 2, 3]), :]
    c2w[:, 2] *= -1
    return c2w


def weighted_median(weights: np.ndarray) -> int:
    values = np.arange(len(weights))
    c = np.cumsum(weights)
    idx = int(np.clip(np.searchsorted(c, 0.5 * c[-1]), 0, len(values) - 1))
    return values[idx]


def batch_weighted_median(weights: np.ndarray) -> np.ndarray:
    return np.array([weighted_median(w) for w in weights])


def triangulate_points(P1, P2, x1, x2) -> np.ndarray:
    """Two-view triangulation via the 6x6 SVD construction.

    ``P1,P2``: [3,4] projections; ``x1,x2``: [n,3] homogeneous image points.
    Returns [n,4] homogeneous world points.
    """
    if not len(x2) == len(x1):
        raise ValueError("Number of points don't match.")
    X = []
    for p_1, p_2 in zip(x1, x2):
        M = np.zeros((6, 6))
        M[:3, :4] = P1
        M[3:, :4] = P2
        M[:3, 4] = -p_1
        M[3:, 5] = -p_2
        _, _, V = np.linalg.svd(M)
        X.append(V[-1, :4])
    return np.array(X) / X[-1][3]


def triangulate_and_reproject(points, Ps):
    """Pairwise triangulation over all camera pairs, median-aggregated.

    ``points``: length-C sequence of [2] pixel coordinates (None = missing);
    ``Ps``: [C,3,4]. Returns ``(reprojections [C,2], position [3])``.
    """
    idx = np.array([i for i in range(len(points)) if points[i] is not None], dtype=int)
    if len(idx) < 2:
        return points, np.nan * np.zeros(3)

    all_projs, all_positions = [], []
    arr_points = np.array([[points[i][0], points[i][1]] for i in idx]).reshape(-1, 2)
    for i in range(len(idx)):
        P_i = Ps[idx[i]]
        x_i = np.concatenate([arr_points[i : i + 1, :], np.ones((1, 1))], axis=1)
        for j in range(i + 1, len(idx)):
            P_j = Ps[idx[j]]
            x_j = np.concatenate([arr_points[j : j + 1, :], np.ones((1, 1))], axis=1)
            pos_3d = triangulate_points(P_i, P_j, x_i, x_j).flatten()
            pos_3d /= pos_3d[-1]
            all_positions.append(pos_3d[:3])
            new_points = np.array([P @ pos_3d for P in Ps])
            all_projs.append(new_points)
    all_projs = np.array(all_projs)
    all_positions = np.array(all_positions)
    all_projs = all_projs[..., :2] / all_projs[..., 2:3]
    return np.median(all_projs, axis=0), np.median(all_positions, axis=0)


def get_rough_center_3d(masks: np.ndarray, Ps: np.ndarray) -> np.ndarray:
    """Rough 3D center: per-view weighted-median of mask marginals,
    triangulated across views."""
    assert masks.ndim == 3
    assert len(masks) == len(Ps)
    medians_x1 = batch_weighted_median(masks.sum(axis=-2))
    medians_x2 = batch_weighted_median(masks.sum(axis=-1))
    medians = np.array([medians_x1, medians_x2]).T  # [C,2]
    _, p_3d = triangulate_and_reproject(list(medians), Ps)
    return p_3d


def adjust_principal_points_to_seed(
    masks: np.ndarray,
    Ks: np.ndarray,
    extrinsics: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Adaptive-camera: shift each view's principal point so the DLT-seed
    (triangulated from mask medoids) reprojects exactly through its medoid.

    Returns ``(new_Ks [V,3,3], seed [3])``.
    """
    V, H, W = masks.shape
    assert Ks.shape == (V, 3, 3)
    assert extrinsics.shape == (V, 4, 4)

    medoids = []
    for i in range(V):
        ys, xs = np.nonzero(masks[i])
        if xs.size == 0:
            raise ValueError(f"Mask {i} is empty")
        cy, cx = ys.mean(), xs.mean()
        d2 = (ys - cy) ** 2 + (xs - cx) ** 2
        j = np.argmin(d2)
        medoids.append((xs[j], ys[j]))
    medoids = np.array(medoids, dtype=np.float64)

    Ps = []
    for i in range(V):
        Rt = np.concatenate([extrinsics[i][:3, :3], extrinsics[i][:3, 3:]], axis=1)
        Ps.append(Ks[i] @ Rt)
    Ps = np.stack(Ps, axis=0)

    # DLT over all views.
    A_rows = []
    for i in range(V):
        u, v = medoids[i]
        P = Ps[i]
        A_rows.append(u * P[2] - P[0])
        A_rows.append(v * P[2] - P[1])
    A = np.vstack(A_rows)
    _, _, Vt = np.linalg.svd(A)
    X_h = Vt[-1]
    X_h /= X_h[3]
    X = X_h[:3]

    new_Ks = Ks.copy()
    for i in range(V):
        R = extrinsics[i][:3, :3]
        t = extrinsics[i][:3, 3]
        X_cam = R @ X + t
        fx, fy = Ks[i, 0, 0], Ks[i, 1, 1]
        u_star, v_star = medoids[i]
        new_Ks[i, 0, 2] = u_star - fx * (X_cam[0] / X_cam[2])
        new_Ks[i, 1, 2] = v_star - fy * (X_cam[1] / X_cam[2])

    return new_Ks, X


def camera_extrinsic_spherical(radius: float, theta: float, phi: float) -> np.ndarray:
    """OpenCV-convention extrinsic for a camera on a sphere looking at the
    origin, up aligned with -z (``scripts/preprocessing/calculate_visual_features.py:29-99``)."""
    x = radius * np.sin(theta) * np.cos(phi)
    y = radius * np.sin(theta) * np.sin(phi)
    z = radius * np.cos(theta)
    C = np.array([x, y, z], dtype=float)

    forward = -C
    forward /= np.linalg.norm(forward)
    global_up = -np.array([0.0, 0.0, 1.0])
    right = np.cross(global_up, forward)
    right /= np.linalg.norm(right)
    up = np.cross(forward, right)
    up /= np.linalg.norm(up)

    R = np.stack([right, up, forward], 1).T
    t = -R @ C
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = t
    return E
