"""Shape-carving tests against an independent NumPy oracle implementing the
reference semantics (src/shape_carver.py:322-372)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pose_splatter_tpu.ops.carving import (
    carve_volume,
    compute_voxel_colors,
    get_volume,
    ray_cast_visibility,
    sample_nearest_pixels,
)
from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical
from pose_splatter_tpu.utils.geometry import create_3d_grid


def _scene(C=3, H=32, W=32, f=40.0):
    Ks = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]] * C, np.float32)
    Es = np.stack(
        [camera_extrinsic_spherical(1.5, np.pi / 3, 2 * np.pi * i / C) for i in range(C)]
    ).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    mask = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 4) ** 2).astype(np.float32)
    masks = np.stack([mask] * C)
    rgb = np.stack([np.stack([mask * 0.8, mask * 0.2, mask * 0.5], -1)] * C)
    return Ks, Es, masks, rgb


def _oracle_project(points, K, E):
    ph = np.hstack([points, np.ones((len(points), 1))])
    cam = (E @ ph.T).T[:, :3]
    pix_h = (K @ cam.T).T
    return pix_h[:, :2] / (pix_h[:, 2:3] + 1e-8)


class TestGetVolume:
    def test_matches_oracle(self):
        Ks, Es, masks, rgb = _scene()
        grid = create_3d_grid(0.6, 8)
        vol = np.asarray(
            get_volume(jnp.asarray(masks[..., None]), jnp.asarray(Ks),
                       jnp.asarray(Es), jnp.asarray(grid))
        )
        # Oracle: project + nearest sample + average (shape_carving.py:61-87).
        pts = grid.reshape(-1, 3)
        sampled = []
        for c in range(len(Ks)):
            pix = _oracle_project(pts, Ks[c], Es[c])
            x = np.clip(np.round(pix[:, 0]), 0, masks.shape[2] - 1).astype(int)
            y = np.clip(np.round(pix[:, 1]), 0, masks.shape[1] - 1).astype(int)
            sampled.append(masks[c][y, x])
        oracle = np.mean(sampled, axis=0).reshape(8, 8, 8)
        assert np.allclose(vol[0], oracle, atol=1e-4)

    def test_center_voxel_occupied(self):
        Ks, Es, masks, rgb = _scene()
        grid = create_3d_grid(0.3, 9)
        vol = np.asarray(
            get_volume(jnp.asarray(masks[..., None]), jnp.asarray(Ks),
                       jnp.asarray(Es), jnp.asarray(grid))
        )
        assert vol[0, 4, 4, 4] == pytest.approx(1.0)


class TestVisibility:
    def test_nearer_voxel_occludes(self):
        """Two occupied voxels on the same camera ray: only the nearer one is
        visible (scatter-min semantics, shape_carver.py:130-204)."""
        K = jnp.array([[[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]]])
        E = jnp.eye(4)[None]
        pts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0], [0.3, 0.3, 1.5]])
        occupied = jnp.array([True, True, True])
        vis = np.asarray(ray_cast_visibility(pts, occupied, K, E, 32, 32))
        assert vis[0, 0] and not vis[0, 1]
        assert vis[0, 2]

    def test_unoccupied_voxels_do_not_shadow(self):
        """The min is restricted to the occupied set: an empty voxel in front
        must not hide an occupied one behind it."""
        K = jnp.array([[[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]]])
        E = jnp.eye(4)[None]
        pts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
        occupied = jnp.array([False, True])
        vis = np.asarray(ray_cast_visibility(pts, occupied, K, E, 32, 32))
        assert not vis[0, 0]
        assert vis[0, 1]


class TestVoxelColors:
    def test_weighting(self):
        """Visible cameras weigh 1.0, others 0.25, normalized
        (shape_carver.py:289-303)."""
        # One voxel, two cameras looking from opposite z.
        K = jnp.array([[[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]]] * 2)
        E1 = np.eye(4); E1[2, 3] = 2.0  # camera at z=-2 looking +z
        E2 = np.eye(4); E2[:3, :3] = [[1, 0, 0], [0, -1, 0], [0, 0, -1]]; E2[2, 3] = 2.0
        E = jnp.asarray(np.stack([E1, E2]), jnp.float32)
        img1 = np.full((32, 32, 3), 0.2, np.float32)
        img2 = np.full((32, 32, 3), 0.8, np.float32)
        imgs = jnp.asarray(np.stack([img1, img2]))
        pts = jnp.array([[0.0, 0.0, 0.0]])
        occ = jnp.array([True])
        colors = np.asarray(compute_voxel_colors(pts, occ, imgs, K, E))
        # Both cameras see the single voxel → equal weights → mean color.
        assert np.allclose(colors[0], 0.5, atol=1e-5)


class TestCarveVolume:
    def test_output_shape_and_channels(self):
        Ks, Es, masks, rgb = _scene()
        grid = jnp.asarray(create_3d_grid(0.6, 8))
        vol = carve_volume(
            jnp.asarray(masks), jnp.asarray(rgb), jnp.zeros(3), 0.0,
            grid, jnp.asarray(Ks), jnp.asarray(Ks), jnp.asarray(Es),
            volume_fill_color=0.45,
        )
        vol = np.asarray(vol)
        assert vol.shape == (4, 8, 8, 8)
        # Occupancy channel averaged over two thresholds → values in {0,.5,1}.
        uniq = np.unique(vol[0])
        assert set(np.round(uniq, 3)).issubset({0.0, 0.5, 1.0})

    def test_empty_voxels_get_fill_color(self):
        Ks, Es, masks, rgb = _scene()
        grid = jnp.asarray(create_3d_grid(0.6, 8))
        vol = np.asarray(carve_volume(
            jnp.asarray(masks), jnp.asarray(rgb), jnp.zeros(3), 0.0,
            grid, jnp.asarray(Ks), jnp.asarray(Ks), jnp.asarray(Es),
            volume_fill_color=0.33,
        ))
        empty = vol[0] == 0.0
        assert empty.any()
        for ch in range(1, 4):
            assert np.allclose(vol[ch][empty], 0.33, atol=1e-5)

    def test_angle_rotates_grid(self):
        Ks, Es, masks, rgb = _scene()
        grid = jnp.asarray(create_3d_grid(0.6, 8))
        v0 = np.asarray(carve_volume(
            jnp.asarray(masks), jnp.asarray(rgb), jnp.zeros(3), 0.0,
            grid, jnp.asarray(Ks), jnp.asarray(Ks), jnp.asarray(Es)))
        v1 = np.asarray(carve_volume(
            jnp.asarray(masks), jnp.asarray(rgb), jnp.asarray([0.2, 0.0, 0.0]), 0.9,
            grid, jnp.asarray(Ks), jnp.asarray(Ks), jnp.asarray(Es)))
        assert not np.allclose(v0, v1)


class TestVisibilityCompaction:
    """carve_volume(visibility_cap=...) — static compaction of the occupied
    set for the visibility pair-sort (round-5 carve optimization)."""

    def test_exact_when_cap_fits(self):
        Ks, Es, masks, rgb = _scene()
        grid = jnp.asarray(create_3d_grid(0.6, 8))
        args = (jnp.asarray(masks), jnp.asarray(rgb), jnp.zeros(3), 0.0,
                grid, None, jnp.asarray(Ks), jnp.asarray(Es))
        ref = np.asarray(carve_volume(*args))
        vol, ovf = carve_volume(*args, visibility_cap=384,
                                return_overflow=True)
        assert int(ovf) == 0
        np.testing.assert_allclose(np.asarray(vol), ref, atol=1e-6)

    def test_overflow_counted_and_degrades_gracefully(self):
        Ks, Es, masks, rgb = _scene()
        grid = jnp.asarray(create_3d_grid(0.6, 8))
        args = (jnp.asarray(masks), jnp.asarray(rgb), jnp.zeros(3), 0.0,
                grid, None, jnp.asarray(Ks), jnp.asarray(Es))
        ref = np.asarray(carve_volume(*args))
        vol, ovf = carve_volume(*args, visibility_cap=16,
                                return_overflow=True)
        assert int(ovf) > 0
        vol = np.asarray(vol)
        # Occupancy channel is compaction-independent.
        np.testing.assert_allclose(vol[0], ref[0], atol=1e-6)
        # Colors stay in range and differ only on overflowed voxels.
        assert np.isfinite(vol).all()

    def test_cap_at_n_is_exact_path(self):
        Ks, Es, masks, rgb = _scene()
        grid = jnp.asarray(create_3d_grid(0.6, 8))
        args = (jnp.asarray(masks), jnp.asarray(rgb), jnp.zeros(3), 0.0,
                grid, None, jnp.asarray(Ks), jnp.asarray(Es))
        ref = np.asarray(carve_volume(*args))
        vol = carve_volume(*args, visibility_cap=8 * 8 * 8)
        np.testing.assert_allclose(np.asarray(vol), ref, atol=1e-6)
