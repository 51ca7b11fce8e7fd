"""Microbenchmark of the instance-binned pallas pieces on real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pose_splatter_tpu.ops.projection import project_gaussians
from pose_splatter_tpu.ops.rasterize import _tile_grid, DEFAULT_TILE_PALLAS
from pose_splatter_tpu.ops.rasterize_pallas import (
    _build_instances, composite_instances_pallas, gather_instances,
    instance_rows, pack_conic,
)

H, W = 512, 576
N = 16000
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TILE = ((int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3
        else DEFAULT_TILE_PALLAS)


def timeit(fn, *args, iters=20):
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
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    view = jnp.eye(4, dtype=jnp.float32)

    means, quats, scales, opac, colors = (
        jnp.asarray(a, jnp.float32)
        for a in (means, quats, scales, opac, colors))

    proj = project_gaussians(means, quats, scales, view, K, W, H,
                             radius_clip=0.0)
    ok = proj.valid
    keys = jnp.where(ok, proj.depth, jnp.inf)
    order = jnp.argsort(keys)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    rad = proj.radius[order]
    ok_s = ok[order]
    opac_s = opac[order]
    cols = colors[order]
    packed = pack_conic(mean2d, conic, opac_s, cols, rad)

    th, tw = TILE
    origins, n_ty, n_tx = _tile_grid(H, W, TILE)
    T = n_ty * n_tx
    expand = 16
    mcap = instance_rows(N, T, expand, CHUNK, cap=4 * N + T * CHUNK)
    print(f"T={T} tiles, P={th*tw}, mcap={mcap}, chunk={CHUNK}")

    def build(c, r, v):
        return _build_instances(c, r, v, n_ty, n_tx, TILE, expand, CHUNK,
                                mcap)

    dest, src, astarts, counts, overflow = jax.jit(build)(mean2d, rad, ok_s)
    print("total instances:", int(counts.sum()), "overflow:", int(overflow),
          "max tile count:", int(counts.max()),
          "chunk steps:", int((-(-counts // CHUNK)).sum()))

    t_bin = timeit(build, mean2d, rad, ok_s)
    print(f"bin             : {t_bin:8.3f} ms")

    scat = jax.jit(lambda p, d, s: gather_instances(p, d, s, mcap))
    inst = scat(packed, dest, src)
    t_scat = timeit(lambda p: scat(p, dest, src), packed)
    print(f"gather inst     : {t_scat:8.3f} ms")

    def scat_bwd(p):
        return jax.grad(lambda q: gather_instances(q, dest, src,
                                                   mcap).sum())(p)

    t_scatb = timeit(scat_bwd, packed)
    print(f"gather inst bwd : {t_scatb:8.3f} ms")

    orig32 = origins.astype(jnp.int32)

    def compose(inst):
        return composite_instances_pallas(
            inst, astarts, counts, orig32, TILE, CHUNK, "conic", True, 0.5)

    t_comp = timeit(compose, inst)
    print(f"kernel fwd      : {t_comp:8.3f} ms")

    zc = jnp.zeros_like(counts)

    def compose0(inst):
        return composite_instances_pallas(
            inst, astarts, zc, orig32, TILE, CHUNK, "conic", True, 0.5)

    t_comp0 = timeit(compose0, inst)
    print(f"kernel fwd empty: {t_comp0:8.3f} ms")

    def compose_bwd(inst):
        def lo(i):
            r, a = composite_instances_pallas(
                i, astarts, counts, orig32, TILE, CHUNK, "conic", True, 0.5)
            return (r ** 2).sum() + (a ** 2).sum()
        return jax.grad(lo)(inst)

    t_bwd = timeit(compose_bwd, inst)
    print(f"kernel fwd+bwd  : {t_bwd:8.3f} ms")


if __name__ == "__main__":
    main()


def full_path():
    from pose_splatter_tpu.ops.rasterize import rasterize
    rng = np.random.default_rng(0)
    means = np.concatenate(
        [rng.normal(0, 0.06, (N, 2)), rng.normal(2.0, 0.06, (N, 1))], axis=1)
    quats = rng.normal(size=(N, 4))
    scales = np.exp(rng.normal(-5.0, 0.3, (N, 3)))
    opac = rng.uniform(0.3, 0.95, N)
    colors = rng.uniform(0, 1, (N, 3))
    f = 900.0
    K = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    view = np.eye(4, dtype=np.float32)[None]
    args = tuple(jnp.asarray(a, jnp.float32)
                 for a in (means, quats, scales, opac, colors, view, K))

    def fwd(*a):
        return rasterize(*a[:7], W, H, backgrounds=jnp.ones(3), mode="pallas")

    print(f"full fwd        : {timeit(fwd, *args):8.3f} ms")

    def loss(*a):
        rgb, alpha = fwd(*a)
        return (rgb**2).sum() + (alpha**2).sum()

    for argnums, name in [((0,), "means"), ((3,), "opac"), ((4,), "colors"),
                          ((0, 1, 2, 3, 4), "all")]:
        g = jax.jit(jax.grad(loss, argnums=argnums))
        print(f"fwd+bwd {name:8s}: {timeit(g, *args):8.3f} ms")


if __name__ == "__main__" and len(sys.argv) > 4 and sys.argv[4] == "full":
    full_path()
