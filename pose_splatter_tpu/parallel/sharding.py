"""Sharded training: data-parallel frame batches under jit-with-sharding.

The train step from ``pose_splatter_tpu.train.loop`` is already batched
(vmap over frames). Here we annotate: the frame-batch axis of every batch
array shards over the mesh's ``data`` axis; parameters/optimizer state are
replicated (the model is a few M params — SURVEY.md §5.8: plain DP psum, no
TP/PP needed). XLA then inserts the gradient all-reduce and overlaps it with
the backward pass (latency-hiding scheduler).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pose_splatter_tpu.train.loop import TrainState, _forward_loss


def _batch_sharding(mesh: Mesh, batch_axis: str = "data"):
    return NamedSharding(mesh, P(batch_axis))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place every state leaf replicated across the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, batch_axis: str = "data"):
    """Place batch arrays with their leading axis split over ``batch_axis``."""
    def put(x):
        spec = P(batch_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items()}


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    img_lambda: float,
    ssim_lambda: float,
    mesh: Mesh,
    batch_axis: str = "data",
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Jitted DP train step over ``mesh``. Batch size must be a multiple of
    the ``data`` axis size."""
    repl = NamedSharding(mesh, P())

    def loss_fn(params, batch_stats, batch):
        def single(b):
            return _forward_loss(
                model, params, batch_stats, b, img_lambda, ssim_lambda, True
            )

        loss, (metrics, new_bs) = jax.vmap(single)(batch)
        new_bs = jax.tree.map(lambda x: x.mean(axis=0), new_bs)
        return loss.mean(), (jax.tree.map(lambda x: x.mean(), metrics), new_bs)

    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    def batch_shardings(batch_tree):
        return jax.tree.map(
            lambda x: NamedSharding(mesh, P(batch_axis, *([None] * (x.ndim - 1)))),
            batch_tree,
        )

    jitted = None

    def wrapped(state, batch):
        nonlocal jitted
        if jitted is None:
            state_shardings = jax.tree.map(lambda _: repl, state)
            # Metrics shardings are inferred (replicated falls out of the
            # mean over the sharded batch axis); pinning a fixed key set
            # here broke whenever _forward_loss gained a metric.
            jitted = jax.jit(
                step,
                in_shardings=(state_shardings, batch_shardings(batch)),
            )
        return jitted(state, batch)

    return wrapped
