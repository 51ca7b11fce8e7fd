"""Config system + dataset tests."""

import json
import os

import numpy as np
import pytest

from pose_splatter_tpu.config import Config

h5py = pytest.importorskip("h5py")


class TestConfig:
    def test_path_joining(self, tmp_path):
        cfg = Config({
            "data_directory": "/data",
            "project_directory": "/proj",
            "mask_video_fns": ["a.mp4", "b.mp4"],
            "camera_fn": "cams.h5",
            "model_fn": "ckpt.pt",
            "grid_size": 64,
        })
        assert cfg.mask_video_fns == ["/data/a.mp4", "/data/b.mp4"]
        assert cfg.camera_fn == "/proj/cams.h5"
        assert cfg.grid_size == 64

    def test_defaults(self):
        cfg = Config({"grid_size": 32})
        assert cfg.holdout_views == []
        assert cfg.gaussian_mode == "3d"
        assert cfg.image_downsample == 1

    def test_missing_raises(self):
        cfg = Config({})
        with pytest.raises(AttributeError):
            _ = cfg.nonexistent_key

    def test_to_serializable(self):
        cfg = Config({"grid_size": 64, "ell": 0.2})
        d = cfg.to_serializable()
        assert d["grid_size"] == 64
        assert d["camera_fn"] is None

    def test_render_dims(self):
        cfg = Config({"image_width": 1152, "image_height": 1024,
                      "image_downsample": 4})
        assert cfg.render_width == 288
        assert cfg.render_height == 256

    def test_volume_idx_validation(self):
        good = Config({"grid_size": 64,
                       "volume_idx": [[0, 64], [8, 56], [16, 64]]})
        assert good.validated_volume_idx() == [[0, 64], [8, 56], [16, 64]]
        # The reference debug_quick bug: crop beyond the grid clips to a
        # non-div-16 extent (SURVEY.md §5.6).
        bad = Config({"grid_size": 64,
                      "volume_idx": [[0, 96], [16, 96], [25, 89]]})
        with pytest.raises(ValueError):
            bad.validated_volume_idx()


@pytest.fixture()
def frame_files(tmp_path):
    T, C, H, W = 9, 3, 16, 16
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (T, C, H, W, 3), dtype=np.uint8)
    images[:, :, :4] = 255  # white background strip
    img_fn = str(tmp_path / "images.h5")
    with h5py.File(img_fn, "w") as f:
        f.create_dataset("images", data=images)
    angle_fn = str(tmp_path / "center_rotation.npz")
    np.savez(angle_fn, centers=rng.normal(size=(T, 3)).astype(np.float32),
             angles=np.linspace(0, 1, T), covs=np.zeros((T, 3, 3)))
    return img_fn, angle_fn, T, C, H, W


class TestFrameDataset:
    def test_splits_are_thirds(self, frame_files):
        from pose_splatter_tpu.data.dataset import FrameDataset

        img_fn, angle_fn, T, C, H, W = frame_files
        tr = FrameDataset(img_fn, angle_fn, C, split="train")
        va = FrameDataset(img_fn, angle_fn, C, split="valid")
        te = FrameDataset(img_fn, angle_fn, C, split="test")
        assert len(tr) == T // 3
        assert len(va) == T // 3
        assert len(te) == T - 2 * (T // 3)

    def test_all_split_enumerates_views(self, frame_files):
        from pose_splatter_tpu.data.dataset import FrameDataset

        img_fn, angle_fn, T, C, H, W = frame_files
        ds = FrameDataset(img_fn, angle_fn, C, split="all")
        assert len(ds) == T * C
        _, _, _, _, view = ds.get(5)
        assert view == 5 % C

    def test_sample_shapes_and_mask_rule(self, frame_files):
        from pose_splatter_tpu.data.dataset import FrameDataset

        img_fn, angle_fn, T, C, H, W = frame_files
        ds = FrameDataset(img_fn, angle_fn, C, holdout_views=[1],
                          split="train")
        mask, img, p_3d, angle, view = ds.get(0, view_idx=0)
        assert mask.shape == (C - 1, H, W)
        assert img.shape == (C - 1, H, W, 3)
        # White strip (red == 255) must be background.
        assert mask[:, :4].max() == 0.0
        assert p_3d.shape == (3,)

    def test_holdout_views_never_sampled(self, frame_files):
        from pose_splatter_tpu.data.dataset import FrameDataset

        img_fn, angle_fn, T, C, H, W = frame_files
        ds = FrameDataset(img_fn, angle_fn, C, holdout_views=[0, 2],
                          split="train", seed=3)
        views = {ds.get(i % len(ds))[-1] for i in range(20)}
        assert views == {1}

    def test_loader_batch_layout(self, frame_files):
        from pose_splatter_tpu.data.dataset import FrameDataset, FrameLoader

        img_fn, angle_fn, T, C, H, W = frame_files
        ds = FrameDataset(img_fn, angle_fn, C, holdout_views=[2],
                          split="train")
        loader = FrameLoader(ds, batch_size=2, prefetch=1, drop_last=False)
        batch = next(iter(loader))
        assert batch["mask"].shape == (2, C - 1, H, W)
        assert batch["img"].shape == (2, C - 1, H, W, 3)
        assert batch["view_idx"].dtype == np.int32
        # obs_idx maps view_idx into the observed list.
        obs = list(ds.observed_views)
        for v, o in zip(batch["view_idx"], batch["obs_idx"]):
            assert obs[o] == v

    def test_max_frames_cap(self, frame_files):
        from pose_splatter_tpu.data.dataset import FrameDataset

        img_fn, angle_fn, T, C, H, W = frame_files
        ds = FrameDataset(img_fn, angle_fn, C, split="all", max_frames=6)
        assert len(ds) == 6 * C


class TestBaselineConfigs:
    """Per-animal baseline configs (parity with
    /root/reference/configs/baseline/: mouse/rat/finch/pigeon x 4/5/6
    cameras) parse and pass div-16 volume validation."""

    def test_all_baselines_valid(self):
        import glob

        fns = sorted(glob.glob(
            os.path.join(os.path.dirname(__file__), "..", "configs",
                         "baseline", "*.json")))
        names = {os.path.basename(f) for f in fns}
        expected = {f"{a}_{n}.json" for a, ns in
                    (("mouse", (4, 5, 6)), ("rat", (4, 5, 6)),
                     ("finch", (4, 5, 6)), ("pigeon", (4,))) for n in ns}
        assert expected <= names, expected - names
        for fn in fns:
            cfg = Config(fn)
            vidx = cfg.validated_volume_idx()
            for (i1, i2) in vidx:
                assert (i2 - i1) % 16 == 0
            assert cfg.gaussian_mode in ("2d", "3d")
            assert len(cfg.holdout_views) <= len(cfg.video_fns)


class TestLogAnalysis:
    def test_parse_and_compare(self, tmp_path):
        from pose_splatter_tpu.utils.loganalysis import (
            convergence_summary,
            parse_training_log,
            plot_convergence_comparison,
        )

        log = tmp_path / "t.log"
        log.write_text(
            "junk line\n"
            "epoch 1: iou=0.50000 ssim=0.10000 img=0.40000\n"
            "  validation: 1.10000\n"
            "epoch 2: iou=0.25000 ssim=0.05000 img=0.20000\n"
            "  validation: 0.60000\n")
        d = parse_training_log(str(log))
        assert d["epochs"] == [1, 2]
        assert d["losses"] == pytest.approx([1.0, 0.5])
        assert d["validation"] == pytest.approx([1.1, 0.6])
        s = convergence_summary(d, d)
        assert s["2d"]["loss_reduction_pct"] == pytest.approx(50.0)
        out = plot_convergence_comparison(d, d, str(tmp_path / "c.pdf"))
        assert os.path.exists(out)
