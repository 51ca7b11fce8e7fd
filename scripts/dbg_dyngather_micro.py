"""Microbench: Mosaic in-kernel dynamic_gather rates on real TPU.

Constraint discovered: the Pallas lowering of ``jnp.take_along_axis``
requires indices.shape == operand.shape (lowering.py:2493), i.e. each
gather produces exactly one output element per operand element:
  axis=0: out[i,j] = tab[idx[i,j], j]   (sublane gather, per lane)
  axis=1: out[i,j] = tab[i, idx[i,j]]   (lane crossbar within a row)

This probes correctness + throughput of both, at the image-table shape
used by the carve sampler design ([2304, 128] = 576x512 flattened) and
the row-broadcast pattern (idx[i, :] = s_i) used to fetch full rows.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *a, iters=50):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


S = 2304  # image sublanes (576*512/128)
L = 128


def _run_kernel(axis, tab, idx, reps):
    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[...]
        acc = jnp.zeros_like(t)
        for r in range(reps):
            acc += jnp.take_along_axis(t, idx_ref[...] + r % 2, axis=axis)
        out_ref[...] = acc

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(tab.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    return run


def probe(axis, name, idx_np, reps=32):
    tab = jnp.asarray(np.random.rand(S, L), jnp.float32)
    idx = jnp.asarray(idx_np, jnp.int32)
    run = _run_kernel(axis, tab, idx, reps)
    ms = timeit(run, tab, idx)
    n = S * L * reps
    print(f"{name}: {ms:7.3f} ms for {reps} reps "
          f"({ms * 1e6 / n:.4f} ns/elem, {ms * 1e6 / (S * reps):.2f} ns/row)")


def probe_correct():
    tab_np = np.arange(S * L, dtype=np.float32).reshape(S, L)
    tab = jnp.asarray(tab_np)
    for axis in (0, 1):
        hi = S if axis == 0 else L
        idx_np = np.random.randint(0, hi, (S, L))
        idx = jnp.asarray(idx_np, jnp.int32)

        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(
                tab_ref[...], idx_ref[...], axis=axis)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        expect = np.take_along_axis(tab_np, idx_np, axis=axis)
        ok = np.array_equal(np.asarray(out), expect)
        print(f"axis={axis} correctness: {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    probe_correct()
    # Random per-element sublane gather (worst case).
    probe(0, "dim0 random  ", np.random.randint(0, S - 1, (S, L)))
    # Row-broadcast: every lane of output row i reads source row s_i
    # (the full-row fetch pattern for the carve sampler).
    s = np.random.randint(0, S - 1, (S, 1))
    probe(0, "dim0 rowbcast", s.repeat(L, 1))
    # Lane crossbar.
    probe(1, "dim1 random  ", np.random.randint(0, L - 1, (S, L)))
