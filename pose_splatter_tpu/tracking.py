"""Temporal pose tracking: principal-axis estimation with sign continuity.

Parity with the reference (``/root/reference/src/tracking.py:11-114``):
per-frame largest eigenvector of the carved volume's covariance; sign
ambiguity between consecutive frames resolved by transporting the tracked
point through the W2-optimal-transport map between consecutive Gaussians
``T(x) = μ₂ + A(x − μ₁)``, ``A = Σ₂^½ (Σ₂^½ Σ₁ Σ₂^½)^(-½) Σ₂^½``; the global
sign is fixed by correlating the axes with the direction of motion.

Host-side NumPy: this is a strictly sequential O(T) scalar recurrence over
frames (tiny 3x3 eigendecompositions), not TPU work.
"""

from __future__ import annotations

import numpy as np


def _largest_eigvec(cov: np.ndarray) -> np.ndarray:
    vals, vecs = np.linalg.eigh(cov)
    v = vecs[:, np.argmax(vals)]
    return v / np.linalg.norm(v)


def _cov_sqrt(cov: np.ndarray) -> np.ndarray:
    vals, vecs = np.linalg.eigh(cov)
    return (vecs * np.sqrt(np.clip(vals, 0, None))) @ vecs.T


def optimal_transport_map(mean1, cov1, mean2, cov2, x):
    """W2-optimal transport map between Gaussians, applied to ``x``."""
    sqrt_cov2 = _cov_sqrt(cov2)
    inside = sqrt_cov2 @ cov1 @ sqrt_cov2
    vals_in, vecs_in = np.linalg.eigh(inside)
    sqrt_inside = (vecs_in * np.sqrt(np.clip(vals_in, 0, None))) @ vecs_in.T
    A = sqrt_cov2 @ np.linalg.inv(sqrt_inside) @ sqrt_cov2
    return mean2 + A @ (x - mean1)


def track_principal_axes(means: np.ndarray, covariances: np.ndarray) -> np.ndarray:
    """means [T,n], covariances [T,n,n] → sign-consistent axes [T,n]."""
    T, n = means.shape
    principal_axes = np.zeros((T, n))

    v0 = _largest_eigvec(covariances[0])
    principal_axes[0] = v0
    p_t = means[0] + v0

    for t in range(T - 1):
        v_next = _largest_eigvec(covariances[t + 1])
        p_t_to_next = optimal_transport_map(
            means[t], covariances[t], means[t + 1], covariances[t + 1], p_t
        )
        plus = means[t + 1] + v_next
        minus = means[t + 1] - v_next
        if np.linalg.norm(p_t_to_next - minus) < np.linalg.norm(p_t_to_next - plus):
            v_next = -v_next
        principal_axes[t + 1] = v_next
        p_t = means[t + 1] + v_next

    # Correlate with the direction of motion; flip globally if negative.
    displacements = np.diff(means, axis=0)
    if np.sum(displacements * principal_axes[1:]) < 0:
        principal_axes = -principal_axes

    return principal_axes


def axes_to_yaw_angles(axes: np.ndarray) -> np.ndarray:
    """[T,3] principal axes → [T] yaw angles about +z (atan2 of the xy
    projection; matches calculate_center_rotation.py:184-185 usage)."""
    return np.arctan2(axes[:, 1], axes[:, 0])
