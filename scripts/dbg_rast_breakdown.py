"""Break down fwd+bwd rasterize time at the bench shape: projection+sort,
instance binning, gather, pallas fwd, pallas fwd+bwd, end-to-end."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
import pose_splatter_tpu.ops.rasterize  # noqa: F401
import pose_splatter_tpu.ops.rasterize_pallas  # noqa: F401

R = sys.modules["pose_splatter_tpu.ops.rasterize"]
RP = sys.modules["pose_splatter_tpu.ops.rasterize_pallas"]

H, W = 512, 576
N = 16000

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


def timeit(fn, *a, iters=20):
    out = fn(*a)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


mode = "pallas"
tile_shape = R.DEFAULT_TILE_PALLAS
chunk = R.DEFAULT_CHUNK_PALLAS

# 1. full fwd
def fwd(*a):
    return R.rasterize(*a, width=W, height=H, backgrounds=jnp.ones(3),
                       mode=mode)


def loss(*a):
    rgb, alpha = R.rasterize(*a, width=W, height=H,
                             backgrounds=jnp.ones(3), mode=mode)
    return (rgb ** 2).sum() + (alpha ** 2).sum()
print("full fwd:            %.2f ms" % timeit(jax.jit(fwd), *args))

# 2. full fwd+bwd
g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
print("full fwd+bwd:        %.2f ms" % timeit(g, *args))

# 3. projection + sort + pack only
from pose_splatter_tpu.ops.projection import project_gaussians

@jax.jit
def proj_only(means, quats, scales, opac, colors, view, K):
    proj = jax.vmap(lambda v, k: project_gaussians(
        means, quats, scales, v, k, W, H, near_plane=0.01, far_plane=1e10,
        radius_clip=0.0))(view, K)
    ok = proj.valid
    keys = jnp.where(ok, proj.depth, jnp.inf)
    order = jnp.argsort(keys, axis=1)
    def reorder(x):
        idx = order.reshape(order.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, jnp.broadcast_to(
            idx, order.shape + x.shape[2:]), axis=1)
    mean2d = reorder(proj.mean2d)
    conic = reorder(proj.conic)
    rad = reorder(proj.radius)
    ok_s = reorder(ok)
    opac_ = reorder(jnp.broadcast_to(opac[None], (1, N)))
    cols = reorder(jnp.broadcast_to(colors[None], (1, N, 3)))
    packed = RP.pack_conic(mean2d, conic, opac_, cols, rad)
    return packed, mean2d, rad, ok_s
print("proj+sort+pack:      %.2f ms" % timeit(proj_only, *args))

packed, mean2d, rad, ok_s = proj_only(*args)

# 4. binning only
origins, n_ty, n_tx = R._tile_grid(H, W, tile_shape)
T = n_ty * n_tx
mcap = RP.instance_rows(N, T, 16, chunk, cap=4 * N + T * chunk)
print(f"tiles={T} mcap={mcap}")

@jax.jit
def bin_only(mean2d, rad, ok_s):
    return jax.vmap(lambda c, r, v: RP._build_instances(
        c, r, v, n_ty, n_tx, tile_shape, 16, chunk, mcap))(mean2d, rad, ok_s)
print("bin only:            %.2f ms" % timeit(bin_only, mean2d, rad, ok_s))

dest, src, astarts, counts, overflow = bin_only(mean2d, rad, ok_s)
print("counts: total inst=%d max tile=%d overflow=%d" %
      (int(counts.sum()), int(counts.max()), int(overflow.sum())))

# 5. gather only
@jax.jit
def gather_only(packed, dest, src):
    return jax.vmap(lambda p, d, s: RP.gather_instances(p, d, s, mcap))(
        packed, dest, src)
print("gather fwd:          %.2f ms" % timeit(gather_only, packed, dest, src))

@jax.jit
def gather_vjp(packed, dest, src):
    def f(p):
        return gather_only(p, dest, src).sum()
    return jax.grad(f)(packed)
print("gather fwd+bwd:      %.2f ms" % timeit(gather_vjp, packed, dest, src))

inst = gather_only(packed, dest, src)

# 6. pallas kernel fwd only
inst_flat = inst.reshape(-1, inst.shape[-1])
astarts_flat = astarts.reshape(-1)
counts_flat = counts.reshape(-1)
origins_flat = jnp.tile(origins.astype(jnp.int32), (1, 1))

@jax.jit
def kern_fwd(inst_flat, astarts_flat, counts_flat):
    return RP.composite_instances_pallas(
        inst_flat, astarts_flat, counts_flat, origins_flat.astype(jnp.int32),
        tile_shape, chunk, "conic", True, 0.5)
print("pallas kernel fwd:   %.2f ms" % timeit(kern_fwd, inst_flat, astarts_flat, counts_flat))

@jax.jit
def kern_vjp(inst_flat, astarts_flat, counts_flat):
    def f(i):
        rgb, alpha = RP.composite_instances_pallas(
            i, astarts_flat, counts_flat, origins_flat.astype(jnp.int32),
            tile_shape, chunk, "conic", True, 0.5)
        return (rgb ** 2).sum() + (alpha ** 2).sum()
    return jax.grad(f)(inst_flat)
print("pallas kern fwd+bwd: %.2f ms" % timeit(kern_vjp, inst_flat, astarts_flat, counts_flat))
