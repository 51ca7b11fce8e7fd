"""End-to-end integration: synthetic dataset → config-driven training →
evaluation → export → novel view. Exercises every config-driven code path
the CLI scripts use (the debug_quick-equivalent minimum slice, SURVEY.md §7)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

C = 3
IMG = 48
T = 9  # frames (3 per split)


@pytest.fixture(scope="module")
def synth_project(tmp_path_factory):
    """Build a synthetic multi-camera dataset of a moving colored ball."""
    from pose_splatter_tpu.utils.cameras import (
        camera_extrinsic_spherical,
        get_cam_params,
    )

    root = tmp_path_factory.mktemp("synth")
    proj = root / "project"
    images_dir = proj / "images"
    renders_dir = proj / "renders"
    for d in (proj, images_dir, renders_dir):
        os.makedirs(d, exist_ok=True)

    # Cameras on a ring; up stored as [0,0,-1] so auto-orientation is identity.
    f = 60.0
    K = np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]])
    Ks = np.stack([K] * C)
    Es = np.stack([
        camera_extrinsic_spherical(1.0, np.pi / 2.5, 2 * np.pi * i / C)
        for i in range(C)
    ])
    cam_fn = str(proj / "camera_params.h5")
    with h5py.File(cam_fn, "w") as hf:
        grp = hf.create_group("camera_parameters")
        grp.create_dataset("intrinsic", data=Ks)
        grp.create_dataset("rotation", data=Es[:, :3, :3])
        grp.create_dataset("translation", data=Es[:, :3, 3])
    up_fn = str(proj / "vertical_lines.npz")
    np.savez(up_fn, up=np.array([0.0, 0.0, -1.0]))

    # Use the oriented cameras to synthesize consistent GT images.
    intr, extr, Ps = get_cam_params(cam_fn, ds=1, up_fn=up_fn,
                                    auto_orient=True)

    rng = np.random.default_rng(0)
    centers = 0.05 * rng.normal(size=(T, 3)).astype(np.float64)
    angles = np.linspace(0, 0.5, T)
    ball_r = 0.08

    images = np.full((T, C, IMG, IMG, 3), 255, np.uint8)
    yy, xx = np.mgrid[0:IMG, 0:IMG]
    for t in range(T):
        for c in range(C):
            ph = np.append(centers[t], 1.0)
            cam = extr[c] @ ph
            pix = intr[c] @ cam[:3]
            u, v = pix[0] / pix[2], pix[1] / pix[2]
            rad = intr[c][0, 0] * ball_r / cam[2]
            m = ((xx - u) ** 2 + (yy - v) ** 2) < rad**2
            img = images[t, c]
            img[m] = np.array([180, 60, 120], np.uint8)

    img_fn = str(images_dir / "images.h5")
    with h5py.File(img_fn, "w") as hf:
        hf.create_dataset("images", data=images, compression="gzip",
                          compression_opts=2)

    cr_fn = str(proj / "center_rotation.npz")
    np.savez(cr_fn, centers=centers.astype(np.float32), angles=angles,
             covs=np.tile(np.eye(3)[None] * ball_r**2, (T, 1, 1)))

    config = {
        "data_directory": str(root),
        "project_directory": str(proj),
        "holdout_views": [],
        "image_directory": "images",
        "render_directory": "renders",
        "image_compression_level": 2,
        "camera_fn": "camera_params.h5",
        "vertical_lines_fn": "vertical_lines.npz",
        "center_rotation_fn": "center_rotation.npz",
        "volume_sum_fn": "volume_sum.npy",
        "model_fn": "checkpoint.pt",
        "feature_fn": "features.npy",
        "embedding_fn": "embedding.npy",
        "image_width": IMG,
        "image_height": IMG,
        "image_downsample": 1,
        "adaptive_camera": False,
        "ell": 0.4,
        "ell_tracking": 0.4,
        "grid_size": 16,
        "frame_jump": 1,
        "volume_idx": [[0, 16], [0, 16], [0, 16]],
        "volume_fill_color": 0.45,
        "img_lambda": 0.5,
        "ssim_lambda": 0.0,
        "lr": 1e-3,
        "valid_every": 1,
        "plot_every": 100,
        "save_every": 1,
        "gaussian_mode": "3d",
        "gaussian_config": {},
        "min_n": 16,
        "max_n": 256,
        "num_unets": 2,
        "base_filters": 4,
    }
    cfg_fn = str(proj / "config.json")
    with open(cfg_fn, "w") as fcfg:
        json.dump(config, fcfg)
    return cfg_fn


class TestEndToEnd:
    def test_full_pipeline(self, synth_project):
        from pose_splatter_tpu.config import Config
        from pose_splatter_tpu.train.evaluate import (
            calculate_image_metrics,
            render_images,
            write_evaluation_summary,
        )
        from pose_splatter_tpu.train.trainer import (
            build_datasets,
            build_model,
            checkpoint_path,
            train_from_config,
        )
        from pose_splatter_tpu.train.loop import (
            create_train_state,
            load_checkpoint,
        )
        from pose_splatter_tpu.utils.cameras import get_cam_params
        from pose_splatter_tpu.viz.export import (
            extract_world_gaussians,
            save_npz,
            save_ply_extended,
        )
        from pose_splatter_tpu.viz.render_image import render_novel_view

        import optax

        config = Config(synth_project)

        # --- training (2 epochs over 3 train frames) -------------------
        state, losses, vlosses = train_from_config(
            config, epochs=2, make_plots=False, progress=False,
        )
        assert len(losses) == 2
        assert len(vlosses) == 2
        assert os.path.exists(checkpoint_path(config, False))

        # resume restores epoch + history
        state2, losses2, _ = train_from_config(
            config, epochs=1, load=True, make_plots=False, progress=False,
        )
        assert len(losses2) == 3

        # --- evaluation -----------------------------------------------
        model = build_model(config, render_mode="global")
        (test_ds,) = build_datasets(config, splits=("test",))
        (all_ds,) = build_datasets(config, splits=("all_volumes",))
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   optax.adam(1e-3))
        state, _ = load_checkpoint(checkpoint_path(config, False), state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        render_fn = os.path.join(config.render_directory,
                                 "rendered_images.h5")
        render_images(model, variables, test_ds, len(all_ds), render_fn,
                      progress=False)
        with h5py.File(render_fn, "r") as f:
            assert f["images"].shape == (T, C, IMG, IMG, 4)

        gt_fn = os.path.join(config.image_directory, "images.h5")
        metrics_fn = os.path.join(config.project_directory,
                                  "metrics_test.csv")
        metrics = calculate_image_metrics(render_fn, gt_fn, metrics_fn,
                                          split="test", progress=False)
        assert set(metrics) == {"l1", "iou", "soft_iou", "ssim", "psnr"}
        assert os.path.exists(metrics_fn)
        assert np.isfinite(metrics["psnr"]).all()

        summary_fn = os.path.join(config.project_directory,
                                  "evaluation_metrics.json")
        write_evaluation_summary(metrics, summary_fn)
        assert os.path.exists(summary_fn)

        # --- export ----------------------------------------------------
        mask, img, p_3d, angle, _ = test_ds.get(0, view_idx=0)
        g = extract_world_gaussians(model, variables, mask, img, p_3d, angle)
        assert len(g["means"]) >= 16
        npz_fn = os.path.join(config.project_directory, "g.npz")
        save_npz(g, npz_fn)
        d = np.load(npz_fn, allow_pickle=True)
        assert {"means", "quaternions", "scales", "opacities",
                "colors"} <= set(d.keys())
        ply_fn = os.path.join(config.project_directory, "g.ply")
        save_ply_extended(g, ply_fn)
        with open(ply_fn) as f:
            assert f.readline().strip() == "ply"

        # --- novel view ------------------------------------------------
        K_full, _, _ = get_cam_params(
            config.camera_fn, ds=1, up_fn=config.vertical_lines_fn,
            auto_orient=True)
        rgb = render_novel_view(model, variables, mask, img, p_3d, angle, 0,
                                K_full, IMG, IMG, angle_offset=0.5)
        assert rgb.shape == (IMG, IMG, 3)
        assert np.isfinite(rgb).all()
