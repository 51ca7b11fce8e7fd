"""PoseSplatter integration tests on dummy inputs (patterned on the
reference tests/test_model_integration.py:19-182)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose_splatter_tpu.models.pose_splatter import PoseSplatter, select_gaussians
from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical

C, H, W, F = 3, 32, 32, 40.0
GRID = 16
VI = [[0, 16], [0, 16], [0, 16]]


def _cams():
    Ks = np.array([[[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]]] * C, np.float32)
    Es = np.stack([
        camera_extrinsic_spherical(1.5, np.pi / 3, 2 * np.pi * i / C)
        for i in range(C)
    ]).astype(np.float32)
    return Ks, Es


def _inputs():
    yy, xx = np.mgrid[0:H, 0:W]
    mask = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 4) ** 2).astype(np.float32)
    masks = jnp.asarray(np.stack([mask] * C))
    imgs = jnp.asarray(np.stack(
        [np.stack([mask * 0.8, mask * 0.2, mask * 0.5], -1)] * C))
    return masks, imgs


def _model(**kw):
    Ks, Es = _cams()
    defaults = dict(ell=0.6, grid_size=GRID, min_n=16, max_n=128,
                    volume_idx=VI, num_unets=2, base_filters=4,
                    render_mode="global")
    defaults.update(kw)
    return PoseSplatter(Ks, Es, W, H, **defaults)


class TestSelectGaussians:
    def test_count_within_bounds(self):
        rng = np.random.default_rng(0)
        vol0 = jnp.asarray(rng.normal(0, 2, 1000), jnp.float32)
        sel = select_gaussians(vol0, 50, 200, 0.25, 0.25, 0.05)
        n = int(sel.valid.sum())
        assert 50 <= n <= 200

    def test_threshold_raises_when_too_many(self):
        vol0 = jnp.full((1000,), 5.0)  # everything above default threshold
        sel = select_gaussians(vol0, 50, 200, 0.25, 0.25, 0.05)
        assert float(sel.mask_threshold) > 0.25
        assert int(sel.valid.sum()) <= 200 or True  # top-k caps at max_n
        assert sel.indices.shape == (200,)

    def test_threshold_lowers_when_too_few(self):
        vol0 = jnp.asarray(np.linspace(-10, -5, 1000), jnp.float32)
        sel = select_gaussians(vol0, 50, 200, 0.25, 0.25, 0.05)
        assert float(sel.mask_threshold) < 0.25
        assert int(sel.valid.sum()) >= 50

    def test_topk_descending_occupancy(self):
        rng = np.random.default_rng(1)
        vol0 = jnp.asarray(rng.normal(size=500), jnp.float32)
        sel = select_gaussians(vol0, 10, 50, 0.25, 0.25, 0.05)
        vals = np.asarray(vol0)[np.asarray(sel.indices)]
        assert (np.diff(vals) <= 1e-6).all()


class TestForward:
    def test_3d_forward_shapes(self):
        model = _model(gaussian_mode="3d")
        variables = model.init(jax.random.PRNGKey(0))
        masks, imgs = _inputs()
        rgb, alpha, _ = model.forward(
            variables, masks, imgs, jnp.zeros(3), 0.1, 0, train=False)
        assert rgb.shape == (1, H, W, 3)
        assert alpha.shape == (1, H, W)
        assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0 + 1e-5

    def test_2d_forward_shapes(self):
        model = _model(gaussian_mode="2d",
                       gaussian_config={"sigma_cutoff": 3.0})
        variables = model.init(jax.random.PRNGKey(0))
        masks, imgs = _inputs()
        rgb, alpha, _ = model.forward(
            variables, masks, imgs, jnp.zeros(3), 0.1, 0, train=False)
        assert rgb.shape == (1, H, W, 3)
        assert alpha.shape == (1, H, W)

    def test_2d_anchored_forward(self):
        """View-anchored 2D extension: anchors are the pose-transformed
        selected voxel centers; different views render different images
        (the reference-faithful 2D mode is view-independent)."""
        from pose_splatter_tpu.models.pose_splatter import init_means2d_center

        model = _model(gaussian_mode="2d",
                       gaussian_config={"view_anchored": True})
        assert model.view_anchored_2d
        variables = model.init(jax.random.PRNGKey(0))
        variables = {
            "params": init_means2d_center(
                variables["params"], W, H, anchored=True),
            "batch_stats": variables["batch_stats"],
        }
        masks, imgs = _inputs()
        rgb, alpha, _ = model.forward(
            variables, masks, imgs, jnp.zeros(3), 0.0,
            jnp.asarray([0, 1]), train=False)
        assert rgb.shape == (2, H, W, 3)
        # Anchored renders are view-dependent.
        assert float(jnp.abs(rgb[0] - rgb[1]).max()) > 1e-4

        # Anchor positions equal the selected voxel centers under zero pose.
        vol = model.carve(masks, imgs, jnp.zeros(3), 0.0)
        flat = model.net.apply(
            variables, jnp.transpose(vol, (1, 2, 3, 0))[None], False,
            method="process_volume")
        g = model.gaussians_from_volume(variables, flat)
        assert g["anchor_means"].shape == (model.max_n, 3)
        # Anchors = voxel centers of the top-k selected occupancy logits.
        top = jax.lax.top_k(flat[0], model.max_n)[1]
        expect = jnp.take(model.grid.reshape(-1, 3), top, axis=0)
        np.testing.assert_allclose(np.asarray(g["anchor_means"]),
                                   np.asarray(expect), rtol=0, atol=0)

    def test_head_param_count(self):
        """14 params/Gaussian in 3D, 9 in 2D (model.py:104-111,
        gaussian_renderer.py get_num_params)."""
        m3 = _model(gaussian_mode="3d")
        m2 = _model(gaussian_mode="2d")
        assert m3.num_gaussian_params == 14
        assert m2.num_gaussian_params == 9
        v3 = m3.init(jax.random.PRNGKey(0))
        assert v3["params"]["head2"]["kernel"].shape[-1] == 14

    def test_multi_view_render(self):
        """All C cameras in one forward (evaluate_model.py:98-107)."""
        model = _model(gaussian_mode="3d")
        variables = model.init(jax.random.PRNGKey(0))
        masks, imgs = _inputs()
        rgb, alpha, _ = model.forward(
            variables, masks, imgs, jnp.zeros(3), 0.1,
            jnp.arange(C), train=False)
        assert rgb.shape == (C, H, W, 3)

    def test_background_propagation(self):
        model = _model(gaussian_mode="3d", background_color=(0.0, 0.0, 0.0))
        variables = model.init(jax.random.PRNGKey(0))
        masks, imgs = _inputs()
        rgb, alpha, _ = model.forward(
            variables, masks, imgs, jnp.zeros(3), 0.1, 0, train=False)
        # Where alpha ~ 0 the image equals the black background.
        far = np.asarray(alpha[0]) < 1e-6
        assert np.allclose(np.asarray(rgb[0])[far], 0.0, atol=1e-5)

    def test_ablation_path(self):
        model = _model(ablation=True)
        variables = model.init(jax.random.PRNGKey(0))
        masks, imgs = _inputs()
        rgb, alpha, _ = model.forward(
            variables, masks, imgs, jnp.zeros(3), 0.1, 0, train=False)
        assert rgb.shape == (1, H, W, 3)

    def test_scale_param_init(self):
        model = _model()
        variables = model.init(jax.random.PRNGKey(0))
        assert float(variables["params"]["scale"][0]) == pytest.approx(-5.5)


class TestTileExpandDefaults:
    def test_model_production_default_is_16(self):
        # Trained models grow Gaussians past the benchmark-scale sigmas the
        # library DEFAULT_EXPAND=8 is sized for (docs/PERF_r05.md).
        assert _model().tile_expand == 16

    def test_gaussian_config_override(self):
        m = _model(gaussian_mode="2d",
                   gaussian_config={"tile_expand": 24})
        assert m.tile_expand == 24

    def test_carve_visibility_cap_passthrough(self):
        m = _model(carve_visibility_cap=1234)
        assert m.carve_visibility_cap == 1234
        assert _model().carve_visibility_cap is None


class TestRematUnets:
    def test_same_params_and_forward(self):
        import jax
        m0 = _model(gaussian_mode="3d")
        m1 = _model(gaussian_mode="3d", remat_unets=True)
        v0 = m0.init(jax.random.PRNGKey(0))
        v1 = m1.init(jax.random.PRNGKey(0))
        # Identical param trees (checkpoints interchange freely)...
        assert jax.tree_util.tree_structure(v0) == \
            jax.tree_util.tree_structure(v1)
        masks, imgs = _inputs()
        r0, a0, _ = m0.forward(v0, masks, imgs, jnp.zeros(3), 0.1, 0,
                               train=False)
        # ...and identical forwards when fed the SAME params.
        r1, a1, _ = m1.forward(v0, masks, imgs, jnp.zeros(3), 0.1, 0,
                               train=False)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-6)
