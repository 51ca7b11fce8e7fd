"""Config-driven training orchestration.

The reference's ``scripts/training/train_script.py`` loop, rebuilt for the
jitted step: per-epoch training over shuffled frames, validation every
``valid_every`` epochs, GT/pred + loss-curve plots every ``plot_every``,
checkpoints (params + opt state + loss history) every ``save_every``.
``--load`` resumes model, optimizer, and history; ``--ablation`` trains the
zero-padded volume path with an ``_ablation`` checkpoint suffix
(``train_script.py:345-361,418-433``).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import optax

from pose_splatter_tpu.config import Config
from pose_splatter_tpu.data.dataset import FrameDataset, FrameLoader
from pose_splatter_tpu.models.pose_splatter import PoseSplatter
from pose_splatter_tpu.models.unet3d import init_unet_primary_skip
from pose_splatter_tpu.train.loop import (
    create_train_state,
    load_checkpoint,
    make_eval_step,
    make_train_step,
    save_checkpoint,
)
from pose_splatter_tpu.utils.cameras import get_cam_params

LOSS_NAMES = ("iou", "ssim", "img")


def build_model(config: Config, ablation: bool = False,
                render_mode: Optional[str] = None) -> PoseSplatter:
    if render_mode is None:
        # Pallas kernels on real TPU; XLA tiled path elsewhere (CPU tests).
        render_mode = config.get(
            "render_mode",
            "pallas" if jax.default_backend() == "tpu" else "tiled",
        )
    intrinsic, extrinsic, Ps = get_cam_params(
        config.camera_fn,
        ds=config.image_downsample,
        up_fn=config.vertical_lines_fn,
        auto_orient=True,
        load_up_direction=not config.adaptive_camera,
    )
    return PoseSplatter(
        intrinsics=intrinsic,
        extrinsics=extrinsic,
        W=config.render_width,
        H=config.render_height,
        ell=config.ell,
        grid_size=config.grid_size,
        volume_idx=config.volume_idx,
        ablation=ablation,
        volume_fill_color=config.volume_fill_color,
        holdout_views=config.holdout_views,
        adaptive_camera=config.adaptive_camera,
        gaussian_mode=config.gaussian_mode,
        gaussian_config=config.gaussian_config,
        render_mode=render_mode,
        # Framework extensions (reference hard-codes these, model.py:32-34).
        min_n=config.get("min_n", 1024),
        max_n=config.get("max_n", 16000),
        num_unets=config.get("num_unets", 3),
        base_filters=config.get("base_filters", 8),
        carve_visibility_cap=config.get("carve_visibility_cap", None),
        remat_unets=config.get("remat_unets", False),
    )


def make_adaptive_fn(model: PoseSplatter):
    """Back-compat alias for :meth:`PoseSplatter.make_adaptive_fn` (here it
    runs in the loader's prefetch thread so the jitted step stays static)."""
    return model.make_adaptive_fn()


def build_datasets(config: Config, splits=("train", "valid")):
    img_fn = os.path.join(config.image_directory, "images.h5")
    intrinsic, _, Ps = get_cam_params(
        config.camera_fn,
        ds=config.image_downsample,
        up_fn=config.vertical_lines_fn,
        auto_orient=True,
        load_up_direction=not config.adaptive_camera,
    )
    C = len(Ps)
    return [
        FrameDataset(
            img_fn,
            config.center_rotation_fn,
            C,
            holdout_views=config.holdout_views,
            split=s,
            max_frames=config.max_frames,
        )
        for s in splits
    ]


def checkpoint_path(config: Config, ablation: bool) -> str:
    fn = config.model_fn
    if fn.endswith(".pt"):
        fn = fn[:-3]
    return fn + ("_ablation.ckpt" if ablation else ".ckpt")


def train_from_config(
    config: Config,
    epochs: int = 50,
    load: bool = False,
    ablation: bool = False,
    max_batches: Optional[int] = None,
    batch_size: int = 1,
    seed: int = 0,
    make_plots: bool = True,
    progress: bool = True,
):
    """Run training; returns (state, losses, validation_losses)."""
    model = build_model(config, ablation=ablation)
    train_ds, valid_ds = build_datasets(config)
    adaptive_fn = make_adaptive_fn(model) if config.adaptive_camera else None
    loader = FrameLoader(train_ds, batch_size=batch_size, shuffle=True,
                         seed=seed, adaptive_fn=adaptive_fn)
    valid_loader = FrameLoader(valid_ds, batch_size=batch_size, shuffle=False,
                               seed=seed, adaptive_fn=adaptive_fn)

    tx = optax.adam(config.lr)
    state = create_train_state(model, jax.random.PRNGKey(seed), tx)
    losses, validation_losses = [], []
    epoch = 0

    ckpt_fn = checkpoint_path(config, ablation)
    if load:
        state, extra = load_checkpoint(ckpt_fn, state)
        epoch = int(extra.get("epoch", 0))
        losses = list(extra.get("losses", []))
        validation_losses = list(extra.get("validation_losses", []))
        print(f"Loaded checkpoint from epoch {epoch}.")
    elif not ablation:
        # Fresh start: near-identity U-Net init (train_script.py:356-361).
        params = init_unet_primary_skip(state.params,
                                        in_channels=model.in_channels)
        if model.gaussian_mode == "2d":
            # Start means2d at the image center (documented deviation —
            # removes the pixel-(0,0) escape transient of the raw-pixel
            # 2D head, models/pose_splatter.init_means2d_center).
            from pose_splatter_tpu.models.pose_splatter import (
                init_means2d_center,
            )

            params = init_means2d_center(params, model.W, model.H)
        state = state._replace(params=params)

    step_fn = make_train_step(model, tx, img_lambda=config.img_lambda,
                              ssim_lambda=config.ssim_lambda,
                              batch_size=batch_size)
    eval_fn = make_eval_step(model, img_lambda=config.img_lambda,
                             ssim_lambda=config.ssim_lambda)

    import jax.numpy as jnp

    for _ in range(epochs):
        epoch += 1
        # Accumulate metrics on device; one host sync per epoch (a float()
        # per step would serialize the async dispatch pipeline).
        epoch_metrics = []
        n = 0
        for b_num, batch in enumerate(loader):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch)
            epoch_metrics.append(metrics)
            n += 1
            if max_batches and b_num + 1 >= max_batches:
                break
        if epoch_metrics:
            # One device→host transfer for the whole epoch (each float()
            # is a separate round trip through the device relay).
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *epoch_metrics)
            host = jax.device_get(stacked)
            avg = [float(np.mean(host[k])) for k in LOSS_NAMES]
            # loss_fn means metrics over the vmapped frame batch, so undo
            # the mean to report the epoch's total dropped-instance count.
            dropped = float(np.sum(host.get("overflow", 0.0))) * batch_size
            if dropped > 0:
                print(f"WARNING: rasterizer dropped ~{dropped:.0f} "
                      "Gaussian-tile instances this epoch (binning capacity "
                      "overflow) — raise tile_capacity/tile_expand/"
                      "instance_cap.")
        else:
            avg = [0.0 for _ in LOSS_NAMES]
        losses.append(avg)
        if progress:
            print(f"epoch {epoch}: " +
                  " ".join(f"{k}={v:.5f}" for k, v in zip(LOSS_NAMES, avg)))

        if epoch % config.valid_every == 0:
            vlosses = []
            for b_num, batch in enumerate(valid_loader):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                loss, _ = eval_fn(state, batch)
                vlosses.append(loss)  # device scalar; sync once below
                if max_batches and b_num + 1 >= max_batches:
                    break
            validation_losses.append(
                float(np.mean(jax.device_get(vlosses))) if vlosses else 0.0)
            if progress:
                print(f"  validation: {validation_losses[-1]:.5f}")

        if make_plots and epoch % config.plot_every == 0:
            try:
                from pose_splatter_tpu.viz.plots import (
                    plot_losses,
                    plot_predictions,
                )

                suffix = "_ablation" if ablation else ""
                os.makedirs(config.project_directory, exist_ok=True)
                plot_predictions(
                    model,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    train_ds,
                    save_path=os.path.join(
                        config.project_directory,
                        f"reconstruction{suffix}.pdf"),
                )
                plot_losses(
                    losses, validation_losses, config.valid_every,
                    save_path=os.path.join(config.project_directory,
                                           f"loss{suffix}.pdf"),
                )
            except ImportError:
                pass

        if epoch % config.save_every == 0:
            save_checkpoint(ckpt_fn, state, extra={
                "epoch": epoch,
                "losses": losses,
                "validation_losses": validation_losses,
                "loss_names": list(LOSS_NAMES),
            })

    return state, losses, validation_losses
