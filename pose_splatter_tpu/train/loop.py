"""Jitted training/eval steps and checkpointing.

The reference trains with batch size 1 (``train_script.py:107``) and torch
BatchNorm in per-batch-stats mode. Here a *frame batch* axis is first-class:
``make_train_step(batch_size=B)`` vmaps the forward over B frames — each
frame normalizes with its own batch stats, exactly reproducing the
reference's bs=1 semantics — then means losses/gradients. With a device
mesh, the batch axis shards over devices and the psum falls out of
``jit``-with-sharding (see ``pose_splatter_tpu.parallel``).

Checkpoints hold {step, params, batch_stats, opt_state, loss history}
mirroring the reference checkpoint dict (``train_script.py:418-433``),
stored via Orbax.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pose_splatter_tpu.train.losses import total_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, rng, tx: optax.GradientTransformation) -> TrainState:
    variables = model.init(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def _forward_loss(model, params, batch_stats, batch, img_lambda, ssim_lambda, train):
    variables = {"params": params, "batch_stats": batch_stats}
    rgb, alpha, new_vars, overflow = model.forward(
        variables,
        batch["mask"],
        batch["img"],
        batch["p_3d"],
        batch["angle"],
        batch["view_idx"],
        train=train,
        K_mask=batch.get("K_mask"),  # adaptive-camera temp_K (host hook)
        carve_center=batch.get("seed_3d"),  # adaptive seed (carve grid only)
        mutable=["batch_stats"] if train else None,
        return_overflow=True,
    )
    target_mask = batch["mask"][batch["obs_idx"]]
    target_img = batch["img"][batch["obs_idx"]]
    loss, metrics = total_loss(
        rgb[0], alpha[0], target_img, target_mask, img_lambda, ssim_lambda
    )
    # No-silent-truncation contract: the count of Gaussian×tile instances
    # dropped by finite binning capacity rides along in the metrics so the
    # trainer can flag it (zero in healthy runs).
    metrics = dict(metrics, overflow=overflow.astype(jnp.float32))
    new_bs = new_vars["batch_stats"] if train else batch_stats
    return loss, (metrics, new_bs)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    img_lambda: float,
    ssim_lambda: float,
    batch_size: int = 1,
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build a jitted train step.

    Batch arrays carry a leading frame-batch axis of size ``batch_size``:
        mask [B,C',H,W]; img [B,C',H,W,3]; p_3d [B,3]; angle [B];
        view_idx [B] int32; obs_idx [B] int32 (position of view_idx within
        the observed-view list, for target selection).
    """

    def loss_fn(params, batch_stats, batch):
        def single(b):
            return _forward_loss(
                model, params, batch_stats, b, img_lambda, ssim_lambda, True
            )

        loss, (metrics, new_bs) = jax.vmap(single)(batch)
        # Average running stats over the frame batch (each frame used its
        # own per-sample stats in the forward, matching bs=1 reference).
        new_bs = jax.tree.map(lambda x: x.mean(axis=0), new_bs)
        return loss.mean(), (jax.tree.map(lambda x: x.mean(), metrics), new_bs)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def make_train_multi_step(
    model,
    tx: optax.GradientTransformation,
    img_lambda: float,
    ssim_lambda: float,
    frames: Dict[str, jnp.ndarray],
    steps_per_call: int = 8,
):
    """K train steps per dispatch, scanning over device-resident frames.

    Remote/relay TPU attachments pay a fixed per-dispatch round trip
    (~100-150 ms through the axon relay) that a state→state training
    chain cannot pipeline away; chaining K steps inside one jit amortizes
    it to 1/K (measured: 272 → ~150 ms/step wall at the north-star shape,
    K=8). Also useful on directly-attached chips to amortize dispatch.

    ``frames``: stacked per-frame payloads resident on device —
        mask [T,C',H,W], img [T,C',H,W,3], p_3d [T,3], angle [T].
    Returns ``step(state, frame_idx [K], view_idx [K], obs_idx [K])
    -> (state, metrics_of_last_step)``; each scan iteration gathers its
    frame from the resident stack (one dynamic row slice, no H2D). The
    stack enters the jit as an ARGUMENT (not a closure constant): baked
    closure arrays are serialized into the compile request, which at
    high-res shapes exceeds the remote-compile body limit (HTTP 413).
    """

    def loss_fn(params, batch_stats, batch):
        loss, (metrics, new_bs) = _forward_loss(
            model, params, batch_stats, batch, img_lambda, ssim_lambda, True
        )
        return loss, (metrics, new_bs)

    def one_factory(frames_arg):
        def one(state, idx):
            fi, vi, oi = idx
            # img is stored channel-flattened ([T, C', H, W*3]): XLA spills
            # loop invariants of scan bodies through compressed copies, and
            # the uncompressed copy of a channel-minor image pads 3 lanes
            # to 128 (an 11 GB allocation at the 1152x1024 highres shape).
            img = frames_arg["img"][fi]
            img = img.reshape(img.shape[0], img.shape[1], -1, 3)
            batch = dict(
                mask=frames_arg["mask"][fi],
                img=img,
                p_3d=frames_arg["p_3d"][fi],
                angle=frames_arg["angle"][fi],
                view_idx=vi,
                obs_idx=oi,
            )
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (metrics, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, batch
            )
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt_state,
            ), metrics
        return one

    @jax.jit
    def _multi_step(state: TrainState, frames_arg, frame_idx, view_idx,
                    obs_idx):
        state, metrics = jax.lax.scan(
            one_factory(frames_arg), state, (frame_idx, view_idx, obs_idx),
            length=steps_per_call)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    frames = {k: jnp.asarray(v) for k, v in frames.items()}
    img = frames["img"]
    frames["img"] = img.reshape(*img.shape[:3], -1)  # [T, C', H, W*3]

    def multi_step(state, frame_idx, view_idx, obs_idx):
        return _multi_step(state, frames, frame_idx, view_idx, obs_idx)

    return multi_step


def make_eval_step(model, img_lambda: float, ssim_lambda: float):
    """Jitted validation-loss step for one frame batch (no grads, running
    BN stats; mirrors ``calculate_validation_loss`` train_script.py:39-73)."""

    @jax.jit
    def eval_step(state: TrainState, batch):
        def single(b):
            loss, (metrics, _) = _forward_loss(
                model,
                state.params,
                state.batch_stats,
                b,
                img_lambda,
                ssim_lambda,
                False,
            )
            return loss, metrics

        loss, metrics = jax.vmap(single)(batch)
        return loss.mean(), jax.tree.map(lambda x: x.mean(), metrics)

    return eval_step


# ----------------------------------------------------------------------------
# Checkpointing (Orbax).
# ----------------------------------------------------------------------------

def save_checkpoint(path: str, state: TrainState, extra: Optional[Dict] = None):
    """Save {step, params, batch_stats, opt_state} to ``path`` (Orbax) and
    any JSON-serializable ``extra`` (loss history etc.) alongside it."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if extra is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)


def load_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, Dict]:
    """Restore a checkpoint into the structure of ``state``."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = ckptr.restore(path, target=template)
    new_state = TrainState(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    extra = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            extra = json.load(f)
    return new_state, extra
