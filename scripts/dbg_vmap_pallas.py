"""Does grad(vmap(rasterize mode=pallas)) compose on TPU? Parity vs loop."""
import numpy as np

import jax
import jax.numpy as jnp

from pose_splatter_tpu.ops.rasterize import rasterize_2d

H, W, N, B = 64, 128, 256, 3
rng = np.random.default_rng(0)
means = jnp.asarray(rng.uniform(10, 110, (B, N, 2)), jnp.float32)
scales = jnp.asarray(rng.uniform(1, 4, (B, N, 2)), jnp.float32)
rots = jnp.asarray(rng.uniform(0, np.pi, (B, N)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.2, 0.9, (B, N)), jnp.float32)
cols = jnp.asarray(rng.uniform(0, 1, (B, N, 3)), jnp.float32)


def one(m, s, r, o, c, mode):
    rgb, alpha = rasterize_2d(m, s, r, o, c, W, H, mode=mode,
                              sigma_cutoff=30.0, background=jnp.ones(3))
    return rgb, alpha


def loss(m, s, r, o, c, mode):
    rgb, alpha = one(m, s, r, o, c, mode)
    return (rgb ** 2).sum() + (alpha ** 2).sum()


# forward parity: vmap(pallas) vs per-frame global
rgb_v, al_v = jax.jit(jax.vmap(lambda *a: one(*a, "pallas")))(
    means, scales, rots, opac, cols)
for b in range(B):
    rgb_g, al_g = one(means[b], scales[b], rots[b], opac[b], cols[b],
                      "global")
    np.testing.assert_allclose(np.asarray(rgb_v[b]), np.asarray(rgb_g),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(al_v[b]), np.asarray(al_g),
                               atol=2e-5)
print("vmap fwd parity OK")

# grad-of-vmap parity
def batched_loss(mode, *a):
    return jax.vmap(lambda *x: loss(*x, mode))(*a).sum()

g_p = jax.jit(jax.grad(lambda *a: batched_loss("pallas", *a),
                       argnums=(0, 1, 2, 3, 4)))(
    means, scales, rots, opac, cols)
g_g = jax.jit(jax.grad(lambda *a: batched_loss("global", *a),
                       argnums=(0, 1, 2, 3, 4)))(
    means, scales, rots, opac, cols)
for a, b in zip(g_p, g_g):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                               rtol=1e-3)
print("grad(vmap) parity OK")
