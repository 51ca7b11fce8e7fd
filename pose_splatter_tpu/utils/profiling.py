"""Profiling harness: stage timings, throughput, and XLA traces.

The reference has no tracing/profiling at all (SURVEY.md §5.1 — tqdm bars
only). Here:

- ``time_fn``     — robust wall-clock timing of a jitted callable with a
  forced device→host sync (``block_until_ready`` alone does not synchronize
  through the remote-TPU relay used in some environments).
- ``trace``       — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace directory.
- ``profile_model`` — per-stage breakdown of the PoseSplatter pipeline
  (carve / U-Nets / extraction / render fwd / full fwd+bwd) with Mpix/s
  and steps/s, returned as a dict (also what ``scripts/profile.py`` prints).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _sync(x) -> None:
    leaf = jax.tree_util.tree_leaves(x)
    if leaf:
        np.asarray(leaf[0])


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2,
            **kwargs) -> float:
    """Average seconds per call (compiles/warms first)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _sync(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/trace"):`` — records a jax.profiler trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_model(model, variables, mask, img, p_3d, angle,
                  iters: int = 10) -> Dict[str, Any]:
    """Stage-by-stage timing of one frame's pipeline."""
    mask = jnp.asarray(mask)
    img = jnp.asarray(img)
    p_3d = jnp.asarray(p_3d)
    angle = jnp.float32(angle)
    H, W = model.H, model.W

    carve = jax.jit(lambda m, i, p, a: model.carve(m, i, p, a))
    t_carve = time_fn(carve, mask, img, p_3d, angle, iters=iters)
    volume = jnp.transpose(carve(mask, img, p_3d, angle), (1, 2, 3, 0))[None]

    process = jax.jit(lambda v, vol: model.net.apply(
        v, vol, False, method="process_volume"))
    t_unet = time_fn(process, variables, volume, iters=iters)
    vol_flat = process(variables, volume)

    extract = jax.jit(lambda v, f: model.gaussians_from_volume(v, f))
    t_extract = time_fn(extract, variables, vol_flat, iters=iters)

    def render(v, f):
        g = model.gaussians_from_volume(v, f)
        if model.gaussian_mode == "3d":
            g = model.apply_pose_transform_3d(g, angle, p_3d)
        elif "anchor_means" in g:
            # Anchored-2D: pose-transform the anchors exactly as
            # model.forward does before render (the per-view projection
            # itself happens inside model.render).
            from pose_splatter_tpu.utils.geometry import yaw_rotation

            rot = yaw_rotation(angle)
            g = dict(g)
            g["anchor_means"] = g["anchor_means"] @ rot.T + p_3d
        return model.render(g, jnp.array([0]))

    render_j = jax.jit(render)
    t_render = time_fn(render_j, variables, vol_flat, iters=iters)

    def full(v, m, i, p, a):
        rgb, alpha, _ = model.forward(v, m, i, p, a, 0, train=False)
        return rgb

    full_j = jax.jit(full)
    t_full = time_fn(full_j, variables, mask, img, p_3d, angle, iters=iters)

    def loss(params, bs, m, i, p, a):
        rgb, alpha, _ = model.forward(
            {"params": params, "batch_stats": bs}, m, i, p, a, 0, train=False)
        return (rgb**2).sum() + (alpha**2).sum()

    grad_j = jax.jit(jax.grad(loss))
    t_grad = time_fn(grad_j, variables["params"],
                     variables.get("batch_stats", {}), mask, img, p_3d, angle,
                     iters=iters)

    mpix = H * W / 1e6
    return {
        "image": f"{W}x{H}",
        "grid": list(model.input_size),
        "max_gaussians": model.max_n,
        "carve_ms": t_carve * 1e3,
        "unet_ms": t_unet * 1e3,
        "extract_ms": t_extract * 1e3,
        "render_fwd_ms": t_render * 1e3,
        "full_fwd_ms": t_full * 1e3,
        "full_fwd_bwd_ms": t_grad * 1e3,
        "render_mpix_s": mpix / t_render,
        "train_step_s": t_grad,
        "train_steps_per_s": 1.0 / t_grad,
    }
