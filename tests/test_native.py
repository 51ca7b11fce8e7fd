"""Native C++ fastio: build, correctness vs the NumPy reference, speed."""

import numpy as np
import pytest

from pose_splatter_tpu.data import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library not built (no compiler?)")


class TestDecodeFrame:
    def test_matches_numpy(self, lib_available):
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, (4, 32, 48, 3), dtype=np.uint8)
        raw[0, :8] = 255  # white background block
        mask, img = native.decode_frame(raw)
        ref_img = raw.astype(np.float32) / 255.0
        ref_mask = np.where(ref_img[..., 0] == 1.0, 0.0, 1.0)
        np.testing.assert_allclose(img, ref_img, atol=1e-7)
        np.testing.assert_array_equal(mask, ref_mask)

    def test_dataset_dispatch(self, lib_available):
        from pose_splatter_tpu.data.dataset import decode_frame

        rng = np.random.default_rng(1)
        raw = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
        mask, img = decode_frame(raw)
        assert mask.shape == (2, 16, 16)
        assert img.dtype == np.float32


class TestWhiteOut:
    def test_matches_numpy(self, lib_available):
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 256, (3, 24, 24, 3), dtype=np.uint8)
        masks = rng.integers(0, 256, (3, 24, 24), dtype=np.uint8)
        expected = frames.copy()
        expected[masks < 128] = 255
        out = native.white_out(frames.copy(), masks)
        np.testing.assert_array_equal(out, expected)
