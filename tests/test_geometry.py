"""Unit tests for the geometry layer (grids, projection, quaternions)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pose_splatter_tpu.utils.geometry import (
    create_3d_grid,
    project_points,
    quat_multiply,
    quat_normalize,
    quat_to_rotmat,
    rotate_quats_by_yaw,
    transform_grid,
    yaw_quat,
    yaw_rotation,
)


class TestGrid:
    def test_grid_span_and_shape(self):
        g = create_3d_grid(0.2, 8)
        assert g.shape == (8, 8, 8, 3)
        assert np.isclose(g[0, 0, 0], [-0.1, -0.1, -0.1]).all()
        assert np.isclose(g[-1, -1, -1], [0.1, 0.1, 0.1]).all()

    def test_grid_ij_indexing(self):
        # First axis varies x, second y, third z (meshgrid 'ij').
        g = create_3d_grid(1.0, 4)
        assert g[1, 0, 0, 0] != g[0, 0, 0, 0]
        assert g[1, 0, 0, 1] == g[0, 0, 0, 1]

    def test_volume_idx_crop(self):
        g = create_3d_grid(0.2, 8, volume_idx=[[1, 5], [2, 6], [0, 4]])
        assert g.shape == (4, 4, 4, 3)
        full = create_3d_grid(0.2, 8)
        assert np.allclose(g, full[1:5, 2:6, 0:4])


class TestProjection:
    def _numpy_project(self, points, K, E):
        """Independent oracle: x = K [R|t] X / z."""
        ph = np.hstack([points, np.ones((len(points), 1))])
        cam = (E @ ph.T).T
        pix_h = (K @ cam[:, :3].T).T
        return pix_h[:, :2] / (pix_h[:, 2:3] + 1e-8)

    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3))
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        E = np.eye(4)
        E[:3, 3] = [0.1, -0.2, 3.0]
        ours = np.asarray(project_points(jnp.asarray(pts, jnp.float32),
                                         jnp.asarray(K, jnp.float32),
                                         jnp.asarray(E, jnp.float32)))
        oracle = self._numpy_project(pts, K, E)
        assert np.allclose(ours, oracle, atol=1e-3)

    def test_batched_cameras(self):
        pts = jnp.ones((5, 3))
        K = jnp.tile(jnp.eye(3)[None], (4, 1, 1))
        E = jnp.tile(jnp.eye(4)[None], (4, 1, 1))
        out = project_points(pts, K, E)
        assert out.shape == (4, 5, 2)


class TestQuaternions:
    def test_quat_to_rotmat_identity(self):
        R = quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        assert np.allclose(R, np.eye(3), atol=1e-6)

    def test_yaw_quat_matches_yaw_rotation(self):
        for angle in [0.0, 0.7, -1.3, np.pi]:
            R1 = np.asarray(quat_to_rotmat(yaw_quat(angle)))
            R2 = np.asarray(yaw_rotation(angle))
            assert np.allclose(R1, R2, atol=1e-5)

    def test_quat_multiply_composes_rotations(self):
        rng = np.random.default_rng(1)
        q1 = quat_normalize(jnp.asarray(rng.normal(size=4), jnp.float32))
        q2 = quat_normalize(jnp.asarray(rng.normal(size=4), jnp.float32))
        R12 = quat_to_rotmat(quat_multiply(q1, q2))
        assert np.allclose(
            R12, np.asarray(quat_to_rotmat(q1)) @ np.asarray(quat_to_rotmat(q2)),
            atol=1e-5,
        )

    def test_rotate_quats_by_yaw_equals_matrix_path(self):
        """Direct quaternion composition == the reference's matrix
        round-trip (src/model.py:284-287): R(yaw) @ R(q)."""
        rng = np.random.default_rng(2)
        quats = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
        angle = 0.9
        out = rotate_quats_by_yaw(quats, angle)
        # w >= 0 canonicalization (model.py:419-421)
        assert np.all(np.asarray(out[:, 0]) >= 0)
        R_expected = np.asarray(yaw_rotation(angle))[None] @ np.asarray(
            quat_to_rotmat(quat_normalize(quats))
        )
        R_ours = np.asarray(quat_to_rotmat(quat_normalize(out)))
        assert np.allclose(R_ours, R_expected, atol=1e-5)


class TestTransformGrid:
    def test_shift_only(self):
        g = jnp.asarray(create_3d_grid(0.2, 4))
        out = transform_grid(g, jnp.array([1.0, 2.0, 3.0]), 0.0)
        assert np.allclose(np.asarray(out - g), [1.0, 2.0, 3.0], atol=1e-6)

    def test_yaw_preserves_z(self):
        g = jnp.asarray(create_3d_grid(0.2, 4))
        out = transform_grid(g, jnp.zeros(3), 1.1)
        assert np.allclose(np.asarray(out[..., 2]), np.asarray(g[..., 2]), atol=1e-6)
