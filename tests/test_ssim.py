"""SSIM/PSNR metric tests (optionally cross-checked vs torchmetrics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pose_splatter_tpu.ops.ssim import psnr, ssim


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 32, 3)),
                          jnp.float32)
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_noise_lowers_ssim(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        light = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(np.float32)
        heavy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1).astype(np.float32)
        s_light = float(ssim(jnp.asarray(light), jnp.asarray(img)))
        s_heavy = float(ssim(jnp.asarray(heavy), jnp.asarray(img)))
        assert s_heavy < s_light < 1.0

    def test_matches_torchmetrics_if_available(self):
        torchmetrics = pytest.importorskip("torchmetrics")
        import torch
        from torchmetrics.image import StructuralSimilarityIndexMeasure

        rng = np.random.default_rng(1)
        a = rng.uniform(size=(1, 3, 40, 40)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        tm = StructuralSimilarityIndexMeasure(data_range=1.0)
        ref = float(tm(torch.tensor(b), torch.tensor(a)))
        ours = float(ssim(jnp.asarray(b.transpose(0, 2, 3, 1)),
                          jnp.asarray(a.transpose(0, 2, 3, 1))))
        assert ours == pytest.approx(ref, abs=2e-3)


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        # MSE = 0.01 → PSNR = 20 dB
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)
