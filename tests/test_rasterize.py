"""Renderer tests: analytic single-Gaussian expectations, ordering, tiling
consistency, and gradient checks (patterned on the reference's
tests/test_gaussian_renderer.py:58-159, plus the gradchecks it lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose_splatter_tpu.ops.projection import project_gaussians
from pose_splatter_tpu.ops.rasterize import rasterize, rasterize_2d

W = H = 64
K1 = jnp.array([[[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]]])
EYE = jnp.eye(4)[None]


def _single_gaussian(opacity=0.9, color=(1.0, 0.0, 0.0), z=2.0, scale=0.05):
    means = jnp.array([[0.0, 0.0, z]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), scale)
    opac = jnp.array([opacity])
    colors = jnp.array([list(color)])
    return means, quats, scales, opac, colors


class TestProjection:
    def test_center_projection(self):
        m, q, s, o, c = _single_gaussian()
        proj = project_gaussians(m, q, s, EYE[0], K1[0], W, H)
        # A point at (0,0,2) projects to the principal point.
        assert np.allclose(np.asarray(proj.mean2d[0]), [32.0, 32.0], atol=1e-4)
        assert proj.valid[0]
        assert float(proj.depth[0]) == pytest.approx(2.0)

    def test_behind_camera_culled(self):
        m, q, s, o, c = _single_gaussian(z=-1.0)
        proj = project_gaussians(m, q, s, EYE[0], K1[0], W, H)
        assert not bool(proj.valid[0])

    def test_radius_clip(self):
        m, q, s, o, c = _single_gaussian(scale=1e-4)
        proj = project_gaussians(m, q, s, EYE[0], K1[0], W, H, radius_clip=5.0)
        assert not bool(proj.valid[0])


class Test3DRasterize:
    def test_center_alpha_close_to_opacity(self):
        m, q, s, o, c = _single_gaussian(opacity=0.9)
        rgb, alpha = rasterize(m, q, s, o, c, EYE, K1, W, H, mode="global")
        # At the Gaussian center alpha ≈ opacity (eps2d blur slightly lowers it).
        assert 0.8 < float(alpha[0, 32, 32]) <= 0.9
        assert float(alpha[0, 0, 0]) == 0.0

    def test_background_composited(self):
        m, q, s, o, c = _single_gaussian()
        rgb, alpha = rasterize(
            m, q, s, o, c, EYE, K1, W, H,
            backgrounds=jnp.array([0.0, 1.0, 0.0]), mode="global",
        )
        corner = np.asarray(rgb[0, 0, 0])
        assert np.allclose(corner, [0.0, 1.0, 0.0], atol=1e-6)

    def test_depth_ordering(self):
        """A nearer Gaussian must occlude a farther one regardless of input
        order (3D mode sorts by depth; SURVEY.md §7.L0)."""
        means = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 2.0]])  # far first
        quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        scales = jnp.full((2, 3), 0.08)
        opac = jnp.array([0.95, 0.95])
        colors = jnp.array([[1.0, 0, 0], [0.0, 1.0, 0]])  # far red, near green
        rgb, alpha = rasterize(means, quats, scales, opac, colors, EYE, K1, W, H, mode="global")
        center = np.asarray(rgb[0, 32, 32])
        assert center[1] > center[0], "near (green) Gaussian should dominate"

    def test_tiled_matches_global(self):
        rng = np.random.default_rng(0)
        n = 40
        means = jnp.asarray(rng.normal(0, 0.3, (n, 3)) + [0, 0, 2.0], jnp.float32)
        quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
        scales = jnp.asarray(np.exp(rng.normal(-3.5, 0.3, (n, 3))), jnp.float32)
        opac = jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32)
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        a = rasterize(means, quats, scales, opac, colors, EYE, K1, W, H, mode="global")
        b = rasterize(means, quats, scales, opac, colors, EYE, K1, W, H,
                      mode="tiled", tile_shape=(16, 32))
        assert np.allclose(a[0], b[0], atol=1e-5)
        assert np.allclose(a[1], b[1], atol=1e-5)

    def test_valid_mask_zeroes_gaussians_and_grads(self):
        m, q, s, o, c = _single_gaussian()
        m2 = jnp.concatenate([m, m])
        q2 = jnp.concatenate([q, q])
        s2 = jnp.concatenate([s, s])
        o2 = jnp.concatenate([o, o])
        c2 = jnp.concatenate([c, jnp.array([[0.0, 1.0, 0.0]])])
        valid = jnp.array([True, False])

        def f(o):
            rgb, alpha = rasterize(m2, q2, s2, o, c2, EYE, K1, W, H,
                                   valid=valid, mode="global")
            return rgb.sum()

        g = jax.grad(f)(o2)
        assert float(g[1]) == 0.0
        assert float(g[0]) != 0.0

    def test_gradcheck_means(self):
        m, q, s, o, c = _single_gaussian()

        def f(m):
            rgb, alpha = rasterize(m, q, s, o, c, EYE, K1, W, H, mode="global")
            return (rgb**2).sum()

        g = jax.grad(f)(m)
        eps = 1e-3
        for i in range(3):
            e = np.zeros((1, 3)); e[0, i] = eps
            num = (f(m + e) - f(m - e)) / (2 * eps)
            assert abs(float(num) - float(g[0, i])) < 2e-2 * max(1.0, abs(float(num)))

    def test_multi_camera_batch(self):
        m, q, s, o, c = _single_gaussian()
        views = jnp.tile(EYE, (3, 1, 1))
        Ks = jnp.tile(K1, (3, 1, 1))
        rgb, alpha = rasterize(m, q, s, o, c, views, Ks, W, H, mode="global")
        assert rgb.shape == (3, H, W, 3)
        assert np.allclose(rgb[0], rgb[1])


class Test2DRasterize:
    def test_center_color(self):
        """Single 2D Gaussian: center pixel ≈ opacity * color
        (reference test_gaussian_renderer.py:58-88)."""
        m = jnp.array([[32.0, 32.0]])
        s = jnp.array([[4.0, 4.0]])
        rot = jnp.array([0.0])
        o = jnp.array([0.8])
        c = jnp.array([[1.0, 0.0, 0.0]])
        rgb, alpha = rasterize_2d(m, s, rot, o, c, W, H)
        assert float(alpha[32, 32]) == pytest.approx(0.8, abs=1e-5)
        assert float(rgb[32, 32, 0]) == pytest.approx(0.8, abs=1e-5)

    def test_out_of_bounds_contributes_nothing(self):
        m = jnp.array([[500.0, 500.0]])
        s = jnp.array([[2.0, 2.0]])
        rgb, alpha = rasterize_2d(m, s, jnp.zeros(1), jnp.array([0.9]),
                                  jnp.array([[1.0, 0, 0]]), W, H)
        assert float(alpha.max()) < 1e-6

    def test_input_order_compositing(self):
        """2D mode composites in INPUT order (gaussian_renderer.py:416-425):
        the first Gaussian gets full transmittance."""
        m = jnp.array([[32.0, 32.0], [32.0, 32.0]])
        s = jnp.full((2, 2), 4.0)
        rot = jnp.zeros(2)
        o = jnp.array([0.9, 0.9])
        c = jnp.array([[1.0, 0, 0], [0.0, 1.0, 0]])
        rgb, _ = rasterize_2d(m, s, rot, o, c, W, H)
        center = np.asarray(rgb[32, 32])
        # first (red): 0.9; second (green): 0.9 * (1-0.9) = 0.09
        assert center[0] == pytest.approx(0.9, abs=1e-4)
        assert center[1] == pytest.approx(0.09, abs=1e-4)

    def test_rotation_anisotropy(self):
        """A rotated anisotropic Gaussian spreads along its rotated major
        axis (reference test_gaussian_renderer.py:127-159)."""
        m = jnp.array([[32.0, 32.0]])
        s = jnp.array([[8.0, 2.0]])  # wide in x before rotation
        o = jnp.array([0.9])
        c = jnp.array([[1.0, 1.0, 1.0]])
        _, a0 = rasterize_2d(m, s, jnp.array([0.0]), o, c, W, H)
        _, a90 = rasterize_2d(m, s, jnp.array([np.pi / 2]), o, c, W, H)
        # 0 rotation: horizontal spread; 90deg: vertical spread.
        assert float(a0[32, 44]) > float(a0[44, 32])
        assert float(a90[44, 32]) > float(a90[32, 44])

    def test_background_on_empty(self):
        m = jnp.zeros((1, 2))
        rgb, alpha = rasterize_2d(
            m, jnp.ones((1, 2)), jnp.zeros(1), jnp.zeros(1),
            jnp.zeros((1, 3)), W, H, valid=jnp.array([False]),
            background=jnp.array([0.2, 0.4, 0.6]),
        )
        assert np.allclose(np.asarray(rgb[0, 0]), [0.2, 0.4, 0.6], atol=1e-6)
        assert float(alpha.max()) == 0.0

    def test_gradcheck_opacity(self):
        m = jnp.array([[30.0, 34.0]])
        s = jnp.array([[3.0, 5.0]])
        rot = jnp.array([0.4])
        o = jnp.array([0.7])
        c = jnp.array([[0.9, 0.1, 0.3]])

        def f(o):
            rgb, alpha = rasterize_2d(m, s, rot, o, c, W, H)
            return (rgb**2).sum() + (alpha**2).sum()

        g = float(jax.grad(f)(o)[0])
        eps = 1e-3
        num = float((f(o + eps) - f(o - eps)) / (2 * eps))
        assert abs(g - num) < 2e-2 * max(1.0, abs(num))


class TestOverflowContract:
    """Finite binning capacities are counted, never silent (VERDICT r1
    item 6): the count surfaces through rasterize/rasterize_2d and
    model.forward into the train-step metrics."""

    def test_tiled_capacity_overflow_counted(self):
        n = 64
        rng = np.random.default_rng(0)
        means2d = jnp.asarray(
            np.full((n, 2), 16.0) + rng.normal(0, 1.0, (n, 2)), jnp.float32)
        scales2d = jnp.full((n, 2), 4.0)
        rot = jnp.zeros((n,))
        opac = jnp.full((n,), 0.5)
        colors = jnp.ones((n, 3)) * 0.5
        rgb, alpha, ov = rasterize_2d(
            means2d, scales2d, rot, opac, colors, 32, 32,
            mode="tiled", tile_shape=(8, 128), tile_capacity=8,
            return_overflow=True)
        assert int(ov) > 0
        rgb2, alpha2, ov2 = rasterize_2d(
            means2d, scales2d, rot, opac, colors, 32, 32,
            mode="tiled", tile_shape=(8, 128), tile_capacity=n,
            return_overflow=True)
        assert int(ov2) == 0
        # The clipped render is actually missing mass.
        assert float(jnp.abs(alpha - alpha2).max()) > 1e-3

    def test_forward_loss_surfaces_overflow(self):
        import optax

        from pose_splatter_tpu.models.pose_splatter import PoseSplatter
        from pose_splatter_tpu.train.loop import (
            create_train_state,
            make_train_step,
        )
        from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical

        C, H, W, F = 3, 32, 32, 40.0
        Ks = np.array(
            [[[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]]] * C, np.float32)
        Es = np.stack([
            camera_extrinsic_spherical(1.5, np.pi / 3, 2 * np.pi * i / C)
            for i in range(C)
        ]).astype(np.float32)
        model = PoseSplatter(Ks, Es, W, H, ell=0.6, grid_size=16, min_n=16,
                             max_n=64, volume_idx=[[0, 16]] * 3, num_unets=1,
                             base_filters=4, render_mode="tiled",
                             tile_shape=(8, 128), tile_capacity=4)
        yy, xx = np.mgrid[0:H, 0:W]
        m = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 3) ** 2)
        m = m.astype(np.float32)
        batch = dict(
            mask=jnp.asarray(np.stack([m] * C))[None],
            img=jnp.asarray(np.stack([np.stack([m] * 3, -1)] * C))[None],
            p_3d=jnp.zeros((1, 3)),
            angle=jnp.zeros((1,)),
            view_idx=jnp.zeros((1,), jnp.int32),
            obs_idx=jnp.zeros((1,), jnp.int32),
        )
        tx = optax.adam(1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0), tx)
        step = make_train_step(model, tx, img_lambda=0.5, ssim_lambda=0.0,
                               donate=False)
        _, metrics = step(state, batch)
        assert "overflow" in metrics
        assert float(metrics["overflow"]) > 0  # capacity 4 must clip
