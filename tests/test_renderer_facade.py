"""Renderer facade tests (API parity with the reference renderer layer;
patterned on tests/test_gaussian_renderer.py:28-48,253-290)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pose_splatter_tpu.ops.renderer import (
    GaussianRenderer,
    GaussianRenderer2D,
    GaussianRenderer3D,
    create_renderer,
)


class TestFactory:
    def test_abc_not_instantiable(self):
        with pytest.raises(TypeError):
            GaussianRenderer(64, 64)

    def test_modes_and_case_insensitivity(self):
        assert isinstance(create_renderer("2d", 32, 32), GaussianRenderer2D)
        assert isinstance(create_renderer("3D", 32, 32), GaussianRenderer3D)
        with pytest.raises(ValueError):
            create_renderer("4d", 32, 32)

    def test_kwargs_forwarding(self):
        r = create_renderer("2d", 32, 32, sigma_cutoff=4.0, kernel_size=7,
                            batch_size=5)
        assert r.sigma_cutoff == 4.0
        assert r.kernel_size == 7

    def test_num_params(self):
        assert create_renderer("3d", 32, 32).get_num_params() == 14
        assert create_renderer("2d", 32, 32).get_num_params() == 9

    def test_background_validation(self):
        r = create_renderer("2d", 32, 32)
        with pytest.raises(ValueError):
            r.set_background_color(jnp.zeros(4))
        r.set_background_color(jnp.array([1.0, 0.5, 0.0]))
        assert np.allclose(np.asarray(r.background_color), [1.0, 0.5, 0.0])


class TestRender:
    def test_3d_unified_params(self):
        r = create_renderer("3d", 32, 32, render_mode="global")
        params = jnp.concatenate([
            jnp.array([[0.0, 0.0, 2.0]]),  # means
            jnp.full((1, 3), -3.0),  # log scales
            jnp.array([[1.0, 0, 0, 0]]),  # quats
            jnp.array([[1.0, 0.0, 0.0]]),  # colors
            jnp.array([[2.0]]),  # logit opacity
        ], axis=1)
        K = jnp.array([[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]])
        rgb, alpha = r.render(params, jnp.eye(4), K)
        assert rgb.shape == (32, 32, 3)
        assert alpha.shape == (32, 32)
        assert float(alpha[16, 16]) > 0.5

    def test_3d_wrong_param_count_raises(self):
        r = create_renderer("3d", 32, 32)
        with pytest.raises(ValueError):
            r.render(jnp.zeros((5, 9)), jnp.eye(4), jnp.eye(3))

    def test_2d_unified_params(self):
        r = create_renderer("2d", 32, 32)
        r.set_background_color(jnp.zeros(3))
        params = jnp.concatenate([
            jnp.array([[16.0, 16.0]]),  # means 2d
            jnp.full((1, 2), 1.0),  # log scales
            jnp.zeros((1, 1)),  # rotation
            jnp.array([[0.0, 1.0, 0.0]]),  # colors
            jnp.array([[3.0]]),  # logit opacity
        ], axis=1)
        rgb, alpha = r.render(params, None, None)
        assert float(rgb[16, 16, 1]) > 0.5
        assert float(alpha[0, 0]) < 0.1

    def test_cross_renderer_shape_consistency(self):
        """Both renderers produce the same output shapes
        (test_gaussian_renderer.py:293-334)."""
        r3 = create_renderer("3d", 24, 40, render_mode="global")
        r2 = create_renderer("2d", 24, 40)
        p3 = jnp.zeros((3, 14)).at[:, 2].set(2.0).at[:, 6].set(1.0)
        p2 = jnp.zeros((3, 9))
        K = jnp.array([[50.0, 0, 12], [0, 50.0, 20], [0, 0, 1]])
        out3 = r3.render(p3, jnp.eye(4), K)
        out2 = r2.render(p2, None, None)
        assert out3[0].shape == out2[0].shape == (40, 24, 3)
        assert out3[1].shape == out2[1].shape == (40, 24)
