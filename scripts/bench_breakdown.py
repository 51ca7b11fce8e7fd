"""Stage-by-stage timing of the rasterizer on the bench workload.

Times (fwd-only and fwd+bwd where meaningful):
  project+sort | +chunk binning | pallas fwd | pallas fwd+bwd | full
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
    _tile_grid, rasterize, DEFAULT_TILE_PALLAS,
)
from pose_splatter_tpu.ops.rasterize_pallas import (
    composite_tiles_pallas, pack_conic,
)

H, W = 512, 576
N = 16000
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 32
TILE = ((int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3
        else DEFAULT_TILE_PALLAS)
CAP = 4096


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

    def stage_bin(means, quats, scales, opac, colors, view, K):
        mean2d, conic, rad, ok, opac_s, cols_s = stage_proj(
            means, quats, scales, opac, colors, view, K)
        packed = pack_conic(mean2d, conic, opac_s, cols_s, rad)
        packed = jnp.where(ok[:, None], packed, 0.0)
        origins, _, _ = _tile_grid(H, W, TILE)
        th, tw = TILE
        y0 = origins[:, 0:1].astype(packed.dtype)
        x0 = origins[:, 1:2].astype(packed.dtype)
        r = jnp.where(ok, rad, 0.0)[None, :]
        inter = (ok[None, :] & (mean2d[None, :, 0] + r >= x0)
                 & (mean2d[None, :, 0] - r < x0 + tw)
                 & (mean2d[None, :, 1] + r >= y0)
                 & (mean2d[None, :, 1] - r < y0 + th))
        pad = (-N) % CHUNK
        n_chunks = (N + pad) // CHUNK
        if pad:
            inter = jnp.pad(inter, ((0, 0), (0, pad)))
            packed = jnp.pad(packed, ((0, pad), (0, 0)))
        chunk_any = inter.reshape(-1, n_chunks, CHUNK).any(axis=2)
        chunk_list = jnp.argsort(~chunk_any, axis=1, stable=True)
        nlive = chunk_any.sum(axis=1).astype(jnp.int32)
        packed_chunks = packed.reshape(n_chunks, CHUNK, -1).transpose(0, 2, 1)
        return packed_chunks, chunk_list, nlive

    packed_chunks, chunk_list, nlive = jax.jit(stage_bin)(*a)
    origins, _, _ = _tile_grid(H, W, TILE)
    origins = jnp.asarray(origins, jnp.int32)

    def stage_compose(packed_chunks, chunk_list, nlive):
        return composite_tiles_pallas(packed_chunks, chunk_list, nlive,
                                      origins, TILE, "conic", True, 0.5)

    def stage_compose_grad(packed_chunks, chunk_list, nlive):
        def loss(p):
            rgb, al = composite_tiles_pallas(p, chunk_list, nlive, origins,
                                             TILE, "conic", True, 0.5)
            return (rgb ** 2).sum() + (al ** 2).sum()
        return jax.grad(loss)(packed_chunks)

    def full_loss(means, quats, scales, opac, colors, view, K):
        rgb, alpha = rasterize(means, quats, scales, opac, colors,
                               view[None], K[None], W, H,
                               backgrounds=jnp.ones(3), mode="pallas",
                               tile_shape=TILE, chunk=CHUNK)
        return (rgb ** 2).sum() + (alpha ** 2).sum()

    full_grad = jax.grad(full_loss, argnums=(0, 1, 2, 3, 4))

    print(f"nlive: max={int(nlive.max())} sum={int(nlive.sum())} "
          f"tiles={nlive.shape[0]} nonzero={int((nlive > 0).sum())}")
    print(f"project+sort   : {timeit(stage_proj, *a):7.3f} ms")
    print(f"+chunk binning : {timeit(stage_bin, *a):7.3f} ms")
    print(f"pallas fwd     : "
          f"{timeit(stage_compose, packed_chunks, chunk_list, nlive):7.3f} ms")
    print(f"pallas fwd+bwd : "
          f"{timeit(stage_compose_grad, packed_chunks, chunk_list, nlive):7.3f} ms")
    print(f"full fwd       : {timeit(full_loss, *a):7.3f} ms")
    print(f"full fwd+bwd   : {timeit(full_grad, *a):7.3f} ms")


if __name__ == "__main__":
    main()
