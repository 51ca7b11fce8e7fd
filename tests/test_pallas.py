"""Pallas kernel parity tests (interpret mode on CPU).

The Pallas tiled compositor must match the XLA tiled path — forward values
and hand-derived gradients — for both renderer modes, including dynamic
per-tile counts, empty tiles, and the early-stop semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pose_splatter_tpu.ops.rasterize import rasterize, rasterize_2d

W = H = 64
K1 = jnp.array([[[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]]])
EYE = jnp.eye(4)[None]


def _gaussians(n=50, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.normal(0, 0.3, (n, 3)) + [0, 0, 2.0], jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(-3.5, 0.3, (n, 3))), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    return means, quats, scales, opac, colors


class TestPallas3D:
    def test_forward_matches_xla(self):
        m, q, s, o, c = _gaussians()
        with pltpu.force_tpu_interpret_mode():
            a = rasterize(m, q, s, o, c, EYE, K1, W, H, mode="tiled",
                          tile_shape=(8, 128), tile_capacity=64)
            b = rasterize(m, q, s, o, c, EYE, K1, W, H, mode="pallas",
                          tile_shape=(8, 128), tile_capacity=64)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   atol=1e-5)

    def test_grads_match_xla(self):
        m, q, s, o, c = _gaussians(40, 1)

        def loss(mode, m, q, s, o, c):
            rgb, al = rasterize(m, q, s, o, c, EYE, K1, W, H, mode=mode,
                                tile_shape=(8, 128), tile_capacity=64)
            return (rgb * jnp.arange(3)).sum() + (al**2).sum()

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss, argnums=(1, 2, 3, 4, 5))("tiled", m, q, s, o, c)
            g2 = jax.grad(loss, argnums=(1, 2, 3, 4, 5))("pallas", m, q, s, o, c)
        for a, b in zip(g1, g2):
            scale = np.abs(np.asarray(a)).max() + 1e-6
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4 * max(scale, 1.0))

    def test_empty_scene(self):
        m, q, s, o, c = _gaussians(8)
        valid = jnp.zeros(8, bool)
        with pltpu.force_tpu_interpret_mode():
            rgb, alpha = rasterize(m, q, s, o, c, EYE, K1, W, H,
                                   valid=valid, mode="pallas",
                                   tile_shape=(8, 128), tile_capacity=32,
                                   backgrounds=jnp.array([0.5, 0.5, 0.5]))
        assert float(alpha.max()) == 0.0
        assert np.allclose(np.asarray(rgb), 0.5, atol=1e-6)


class TestPallas2D:
    def test_forward_and_grads_match_xla(self):
        rng = np.random.default_rng(2)
        n = 40
        m2 = jnp.asarray(rng.uniform(0, 64, (n, 2)), jnp.float32)
        s2 = jnp.asarray(rng.uniform(1, 6, (n, 2)), jnp.float32)
        rot = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
        op = jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32)
        c = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

        def render(mode):
            with pltpu.force_tpu_interpret_mode():
                return rasterize_2d(m2, s2, rot, op, c, W, H, mode=mode,
                                    tile_shape=(8, 128), tile_capacity=64,
                                    sigma_cutoff=30.0)

        a = render("tiled")
        b = render("pallas")
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   atol=1e-5)

        def loss(mode, m, s, r, o, col):
            rr, al = rasterize_2d(m, s, r, o, col, W, H, mode=mode,
                                  tile_shape=(8, 128), tile_capacity=64,
                                  sigma_cutoff=30.0)
            return (rr * jnp.arange(3)).sum() + (al**2).sum()

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss, argnums=(1, 2, 3, 4, 5))("tiled", m2, s2, rot, op, c)
            g2 = jax.grad(loss, argnums=(1, 2, 3, 4, 5))("pallas", m2, s2, rot, op, c)
        for a_, b_ in zip(g1, g2):
            scale = np.abs(np.asarray(a_)).max() + 1e-6
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       atol=3e-4 * max(scale, 1.0))
