"""Measure the remote-TPU dispatch floor: ms/iter for trivial jitted work
chained like the bench loop. If this floor is ~30 ms, bench numbers measure
the relay, not the kernels."""
import time

import jax
import jax.numpy as jnp
import numpy as np

x = jnp.ones((256, 256), jnp.float32)


@jax.jit
def tiny(x):
    return x @ x


@jax.jit
def tiny_chain(x):
    for _ in range(10):
        x = x @ x * 1e-3
    return x


for name, fn, iters in (("tiny matmul", tiny, 50),
                        ("tiny chain x10", tiny_chain, 50)):
    out = fn(x)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.3f} ms/iter")

# Sequential-dependency chain mirroring bench (each iter consumes prev).
big = jnp.ones((2048, 2048), jnp.float32)


@jax.jit
def bigmm(a):
    return a @ a * 1e-4


out = bigmm(big)
np.asarray(out)
t0 = time.perf_counter()
for _ in range(50):
    out = bigmm(out)
np.asarray(out)
print(f"2048 matmul: {(time.perf_counter()-t0)/50*1e3:.3f} ms/iter "
      f"(compute ~0.09 ms at SoL)")
