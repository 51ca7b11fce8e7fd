"""3D U-Net tests: shapes, passthrough, near-identity init."""

import numpy as np
import jax
import jax.numpy as jnp

from pose_splatter_tpu.models.unet3d import Unet3D, init_unet_primary_skip

SIZE = (16, 16, 16)


def _make(out_channels=8):
    model = Unet3D(in_channels=4, out_channels=out_channels, base_filters=4,
                   input_size=SIZE)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, *SIZE, 4)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


class TestUnet3D:
    def test_output_shape(self):
        model, variables, x = _make()
        y, _ = model.apply(variables, x, False)
        assert y.shape == (1, *SIZE, 8)

    def test_input_passthrough(self):
        """First in_channels of the output are exactly the input
        (unet_3d.py:165)."""
        model, variables, x = _make()
        y, _ = model.apply(variables, x, False)
        assert np.allclose(np.asarray(y[..., :4]), np.asarray(x))

    def test_identity_init(self):
        """After init_unet_primary_skip the non-passthrough channels are
        near zero (unet_3d.py:171-188 self-test: MSE ~ 0)."""
        model, variables, x = _make()
        params = init_unet_primary_skip(variables["params"], in_channels=4)
        y, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]}, x, False)
        resid = np.asarray(y[..., 4:])
        assert np.abs(resid).mean() < 1e-2

    def test_train_mode_batchnorm_mutation(self):
        model, variables, x = _make()
        y, new_vars = model.apply(variables, x, True, mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(new_vars["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))

    def test_div16_assertion(self):
        import pytest
        model = Unet3D(in_channels=4, out_channels=8, base_filters=4,
                       input_size=(17, 16, 16))
        with pytest.raises(AssertionError):
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 17, 16, 16, 4)), train=False)
