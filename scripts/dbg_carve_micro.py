"""Micro-benchmarks of carve constituents at the north-star shape
(N = 128*128*64 voxels, C = 5 cameras, 576x512 images)."""
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 128 * 128 * 64
C = 5
H, W = 512, 576

rng = np.random.default_rng(0)
d = jnp.asarray(rng.uniform(0.5, 1.5, (C, N)), jnp.float32)
idx = jnp.asarray(rng.integers(0, H * W, (C, N)), jnp.int32)
occ = jnp.asarray(rng.uniform(size=N) < 0.1)
imgs = jnp.asarray(rng.uniform(size=(C, H * W, 3)), jnp.float32)
imgs1 = jnp.asarray(rng.uniform(size=(C, H * W, 1)), jnp.float32)


def timeit(name, fn, *a, iters=10):
    red = jax.jit(lambda *x: jax.tree.reduce(
        lambda p, q: p + q,
        jax.tree.map(lambda t: t.astype(jnp.float32).sum(), fn(*x))))
    out = red(*a)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*a)
    np.asarray(out)
    print(f"{name:38s}: {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")


iota = jnp.arange(N, dtype=jnp.int32)

# 1. current: per-cam 2-key lex sort + restore sort, per threshold
def vis_sort(d, idx, occ):
    def per_cam(dd, ii):
        masked = jnp.where(occ, dd, jnp.inf)
        p_s, d_s, i_s = jax.lax.sort((ii, masked, iota), num_keys=2)
        first = jnp.concatenate([jnp.ones((1,), bool), p_s[1:] != p_s[:-1]])
        vis_s = first & jnp.isfinite(d_s)
        _, vis = jax.lax.sort((i_s, vis_s.astype(jnp.int32)), num_keys=1)
        return vis
    return jax.vmap(per_cam)(d, idx)
timeit("lexsort+restore visibility (1 thr)", vis_sort, d, idx, occ)

# 2. single shared sort (threshold-independent keys), scans per threshold,
#    scatter restore
def vis_shared(d, idx, occ):
    def per_cam(dd, ii):
        p_s, d_s, i_s = jax.lax.sort((ii, dd, iota), num_keys=2)
        occ_s = occ[i_s]
        first = jnp.concatenate([jnp.ones((1,), bool), p_s[1:] != p_s[:-1]])
        s = jnp.cumsum(occ_s.astype(jnp.int32))
        excl = s - occ_s.astype(jnp.int32)
        base = jnp.where(first, excl, 0)
        seg_base = jax.lax.cummax(jnp.where(first, excl, -1))
        vis_s = occ_s & ((excl - seg_base) == 0)
        vis = jnp.zeros((N,), jnp.int32).at[i_s].set(
            vis_s.astype(jnp.int32), unique_indices=True)
        return vis
    return jax.vmap(per_cam)(d, idx)
timeit("shared-sort + scan + scatter (1 thr)", vis_shared, d, idx, occ)

# 3. scatter-min based (the reference's torch-scatter semantics)
def vis_scatter(d, idx, occ):
    def per_cam(dd, ii):
        masked = jnp.where(occ, dd, jnp.inf)
        front = jnp.full((H * W,), jnp.inf).at[ii].min(masked)
        return (masked <= front[ii]) & occ
    return jax.vmap(per_cam)(d, idx)
timeit("scatter-min visibility (1 thr)", vis_scatter, d, idx, occ)

# 4. gathers: nearest-pixel sampling
def sample3(imgs, idx):
    return jnp.take_along_axis(imgs, idx[..., None], axis=1)
timeit("sample gather [C,N,3]", sample3, imgs, idx)
timeit("sample gather [C,N,1] (mask)", sample3, imgs1, idx)

# 5. padded gather: pad channel dim to 128 lanes, gather rows, slice
imgsP = jnp.concatenate([imgs, jnp.zeros((C, H * W, 125))], axis=-1)
def sampleP(imgsP, idx):
    return jax.vmap(lambda im, ii: jnp.take(im, ii, axis=0))(imgsP, idx)[..., :3]
timeit("sample gather 128-lane padded", sampleP, imgsP, idx)

# 6. one-hot matmul sampling (MXU): pixels binned? too big; skip.

# 7. projection matmul for scale
pts = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
P34 = jnp.asarray(rng.normal(size=(C, 3, 4)), jnp.float32)
def proj(pts, P34):
    ph = jnp.concatenate([pts, jnp.ones((N, 1))], 1)
    return jnp.einsum("cij,nj->cni", P34, ph)
timeit("projection einsum [C,N,3]", proj, pts, P34)

# 8. paired-threshold visibility from one sort pair (carry both occupancies)
occ2 = jnp.asarray(rng.uniform(size=N) < 0.3)
def vis_paired(d, idx, occ1, occ2):
    def per_cam(dd, ii):
        p_s, d_s, i_s, o1, o2 = jax.lax.sort(
            (ii, dd, iota, occ1.astype(jnp.int32), occ2.astype(jnp.int32)),
            num_keys=2)
        first = jnp.concatenate([jnp.ones((1,), bool), p_s[1:] != p_s[:-1]])
        def firstocc(o):
            s = jnp.cumsum(o)
            excl = s - o
            segbase = jax.lax.cummax(jnp.where(first, excl, -1))
            return (o > 0) & (excl == segbase)
        v1 = firstocc(o1)
        v2 = firstocc(o2)
        _, r1, r2 = jax.lax.sort(
            (i_s, v1.astype(jnp.int32), v2.astype(jnp.int32)), num_keys=1)
        return r1, r2
    return jax.vmap(per_cam)(d, idx)
timeit("paired vis (BOTH thresholds)", vis_paired, d, idx, occ, occ2)

# 9. fused 4-channel sample gather
imgs4 = jnp.concatenate([imgs, imgs1], axis=-1)
timeit("sample gather [C,N,4] fused", sample3, imgs4, idx)

# 10. both current-style thresholds for comparison (=2x item 1)
def vis_two(d, idx, occ1, occ2):
    return vis_sort(d, idx, occ1), vis_sort(d, idx, occ2)
timeit("current vis x2 thresholds", vis_two, d, idx, occ, occ2)
