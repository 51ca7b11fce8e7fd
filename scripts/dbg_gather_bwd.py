"""Probe: why is gather_instances' backward ~460 ms at the bench shape?"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import pose_splatter_tpu.ops.rasterize_pallas  # noqa: F401

RP = sys.modules["pose_splatter_tpu.ops.rasterize_pallas"]

N, E, mcap, FS = 16000, 16, 74240, 128
rng = np.random.default_rng(0)
dest = jnp.asarray(
    rng.permutation(mcap + N * E)[: N * E].astype(np.int32))
rows_np = np.where(rng.random(N * E) < 0.3,
                   rng.integers(0, mcap, N * E), mcap + np.arange(N * E))
dest = jnp.asarray(rows_np.astype(np.int32))
dinst = jnp.asarray(rng.normal(size=(mcap, FS)).astype(np.float32))
packed = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
src = jnp.asarray(np.tile(np.arange(N, dtype=np.int32)[:, None], (1, E)).reshape(-1))


def timeit(fn, *a, iters=10):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


@jax.jit
def bwd_current(dinst, dest):
    live = dest < mcap
    rows = jnp.where(live, dest, 0)
    dslots = jnp.where(live[:, None], dinst[rows, :16], 0.0)
    return dslots.reshape(N, -1, 16).sum(axis=1)


@jax.jit
def bwd_fullrow(dinst, dest):
    live = dest < mcap
    rows = jnp.where(live, dest, mcap)
    dpad = jnp.concatenate([dinst, jnp.zeros((1, FS), dinst.dtype)], axis=0)
    full = jnp.take(dpad, rows, axis=0)  # [N*E, 128] aligned rows
    return full.reshape(N, -1, FS).sum(axis=1)[:, :16]


@jax.jit
def fwd_current(packed, dest, src):
    return RP.gather_instances(packed, dest, src, mcap)


@jax.jit
def sort_only(dest, src):
    return jax.lax.sort_key_val(dest, src)


@jax.jit
def invert_only(dest, src):
    return RP._invert_slots(dest, src, N, mcap)


@jax.jit
def gather_rows_only(dinst):
    inv = jnp.clip(jnp.arange(mcap) * 7 % (N + 1), 0, N)
    padded = jnp.concatenate([jnp.zeros((1, FS))], axis=0)
    p = jnp.zeros((N + 1, FS))
    return p[inv]


print("bwd current (16-lane gather): %.2f ms" % timeit(bwd_current, dinst, dest))
print("bwd full-row gather + slice:  %.2f ms" % timeit(bwd_fullrow, dinst, dest))
print("fwd gather_instances:         %.2f ms" % timeit(fwd_current, packed, dest, src))
print("sort_key_val [N*E]:           %.2f ms" % timeit(sort_only, dest, src))
print("invert_slots:                 %.2f ms" % timeit(invert_only, dest, src))
a = bwd_current(dinst, dest)
b = bwd_fullrow(dinst, dest)
print("allclose:", np.allclose(np.asarray(a), np.asarray(b)))
