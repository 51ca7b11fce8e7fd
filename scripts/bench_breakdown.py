"""Stage-by-stage timing of the rasterizer on the bench workload.

Times (fwd-only and fwd+bwd where meaningful):
  project+sort | +instance binning | pallas fwd | pallas fwd+bwd | full

Usage: bench_breakdown.py [CHUNK] [TILE_H] [TILE_W] [EXPAND]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pose_splatter_tpu.ops.projection import project_gaussians
from pose_splatter_tpu.ops.rasterize import (
    _composite_instances_pallas, _tile_grid, rasterize, DEFAULT_TILE_PALLAS,
)
from pose_splatter_tpu.ops.rasterize_pallas import pack_conic

H, W = 512, 576
N = 16000
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TILE = ((int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3
        else DEFAULT_TILE_PALLAS)
EXPAND = int(sys.argv[4]) if len(sys.argv) > 4 else 16


def timeit(fn, *args, iters=20):
    # Reduce outputs to one scalar on-device so the host sync at the end
    # transfers 4 bytes, not megabytes (the tunnel would dominate timing).
    red = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda t: t.astype(jnp.float32).sum(), fn(*a))))
    out = red(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    means = np.concatenate(
        [rng.normal(0, 0.06, (N, 2)), rng.normal(2.0, 0.06, (N, 1))], axis=1)
    quats = rng.normal(size=(N, 4))
    scales = np.exp(rng.normal(-5.0, 0.3, (N, 3)))
    opac = rng.uniform(0.3, 0.95, N)
    colors = rng.uniform(0, 1, (N, 3))
    f = 900.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    view = np.eye(4, dtype=np.float32)
    a = tuple(jnp.asarray(x, jnp.float32)
              for x in (means, quats, scales, opac, colors, view, K))

    def stage_proj(means, quats, scales, opac, colors, view, K):
        proj = project_gaussians(means, quats, scales, view, K, W, H)
        keys = jnp.where(proj.valid, proj.depth, jnp.inf)
        order = jnp.argsort(keys)
        return jax.tree.map(
            lambda x: x[order],
            (proj.mean2d, proj.conic, proj.radius, proj.valid, opac, colors))

    def stage_packed(means, quats, scales, opac, colors, view, K):
        mean2d, conic, rad, ok, opac_s, cols_s = stage_proj(
            means, quats, scales, opac, colors, view, K)
        packed = pack_conic(mean2d, conic, opac_s, cols_s, rad)
        return packed, mean2d, rad, ok

    def stage_all(means, quats, scales, opac, colors, view, K):
        packed, mean2d, rad, ok = stage_packed(
            means, quats, scales, opac, colors, view, K)
        return _composite_instances_pallas(
            packed[None], mean2d[None], rad[None], ok[None], "conic",
            H, W, TILE, CHUNK, EXPAND, True, 0.5)

    def compose(packed, mean2d, rad, ok):
        rgb, alpha, _ = _composite_instances_pallas(
            packed[None], mean2d[None], rad[None], ok[None], "conic",
            H, W, TILE, CHUNK, EXPAND, True, 0.5)
        return rgb, alpha

    inputs = jax.jit(stage_packed)(*a)

    def compose_grad(packed, mean2d, rad, ok):
        def loss(p):
            rgb, al = compose(p, mean2d, rad, ok)
            return (rgb ** 2).sum() + (al ** 2).sum()
        return jax.grad(loss)(packed)

    def full_loss(means, quats, scales, opac, colors, view, K):
        rgb, alpha = rasterize(means, quats, scales, opac, colors,
                               view[None], K[None], W, H,
                               backgrounds=jnp.ones(3), mode="pallas",
                               tile_shape=TILE, chunk=CHUNK,
                               tile_expand=EXPAND)
        return (rgb ** 2).sum() + (alpha ** 2).sum()

    full_grad = jax.grad(full_loss, argnums=(0, 1, 2, 3, 4))

    print(f"project+sort    : {timeit(stage_proj, *a):7.3f} ms")
    print(f"+bin+compose fwd: {timeit(stage_all, *a):7.3f} ms")
    print(f"compose fwd     : {timeit(compose, *inputs):7.3f} ms")
    print(f"compose fwd+bwd : {timeit(compose_grad, *inputs):7.3f} ms")
    print(f"full fwd        : {timeit(full_loss, *a):7.3f} ms")
    print(f"full fwd+bwd    : {timeit(full_grad, *a):7.3f} ms")


if __name__ == "__main__":
    main()
