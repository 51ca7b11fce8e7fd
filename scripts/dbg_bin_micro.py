"""Micro-benchmarks of the XLA binning/gather constituents on real TPU.

Times each candidate op with a scalar-reduced output (so the tunnel sync
transfers 4 bytes) to attribute the ~14 ms XLA binning+gather stage of the
pallas rasterize path (see scripts/bench_breakdown.py).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 16000
E = 16
T = 160
MCAP = 74240
K = N * E

rng = np.random.default_rng(0)
dest = jnp.asarray(
    np.where(rng.uniform(size=K) < 0.2,
             rng.integers(0, MCAP, K),
             MCAP + np.arange(K)), jnp.int32)
src = jnp.asarray(rng.integers(0, N, K), jnp.int32)
packed = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
oh = jnp.asarray((rng.uniform(size=(N, T)) < 0.02), jnp.float32)


def timeit(name, fn, *args, iters=20):
    red = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda t: t.astype(jnp.float32).sum(), fn(*a))))
    out = red(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    print(f"{name:34s}: {(time.perf_counter()-t0)/iters*1e3:7.3f} ms")


# 1. the sort currently inverting the slot map
timeit("sort_key_val 256k", lambda d, s: jax.lax.sort_key_val(d, s),
       dest, src)

# 2. searchsorted component
ds, ss = jax.lax.sort_key_val(dest, src)
timeit("searchsorted 74k in 256k",
       lambda ds: jnp.searchsorted(ds, jnp.arange(MCAP, dtype=jnp.int32)), ds)

# 3. scalar scatter-set inversion
def scat_inv(dest, src):
    return jnp.full((MCAP,), N, jnp.int32).at[dest].set(
        src, mode="drop", unique_indices=True)
timeit("scatter-set 256k scalars", scat_inv, dest, src)

# 4. row scatter (fused invert+gather)
def scat_rows(dest, packed, src):
    rows = packed[src]
    return jnp.zeros((MCAP, 128), jnp.float32).at[dest].set(
        rows, mode="drop", unique_indices=True)
timeit("scatter-set 256k rows x128", scat_rows, dest, packed, src)

# 5. row gather (what gather_instances does after inversion)
inv = scat_inv(dest, src)
invc = jnp.minimum(inv, N - 1)
timeit("gather 74k rows x128", lambda p, i: jnp.take(p, i, axis=0),
       packed, invc)

# 6. onehot cumsum via MXU (from _build_instances)
from pose_splatter_tpu.ops.rasterize_pallas import _excl_cumsum_mxu
timeit("excl_cumsum_mxu [16k,160]", _excl_cumsum_mxu, oh)

# 7. take_along_axis [N,16] from [N,160]
tile = jnp.asarray(rng.integers(0, T, (N, E)), jnp.int32)
excl = _excl_cumsum_mxu(oh)[0]
timeit("take_along_axis [N,16]",
       lambda e, t: jnp.take_along_axis(e, t, axis=1), excl, tile)

# 8. elementwise [N,T] mask ops (rect test)
cx = jnp.asarray(rng.uniform(0, 576, N), jnp.float32)
def rect(cx):
    tty = (jnp.arange(T, dtype=jnp.int32) // 4)[None, :]
    ry = tty - (cx[:, None] // 37).astype(jnp.int32)
    return ((ry >= 0) & (ry < 3)).astype(jnp.float32)
timeit("elementwise [N,T] rect test", rect, cx)

# 9. argsort over N (depth sort, for scale)
depth = jnp.asarray(rng.normal(size=N), jnp.float32)
timeit("argsort 16k f32", lambda d: jnp.argsort(d), depth)

# 10. sort_key_val 64k (expand=4 equivalent)
timeit("sort_key_val 64k", lambda d, s: jax.lax.sort_key_val(d, s),
       dest[:N * 4], src[:N * 4])
