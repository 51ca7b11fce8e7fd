"""Pallas TPU kernels for tiled Gaussian compositing.

Why Pallas on top of the XLA scan path (``rasterize.py``):

1. **Per-tile dynamic trip counts.** The per-tile Gaussian count is passed
   through ``PrefetchScalarGridSpec``; each tile's ``fori_loop`` runs
   ``ceil(count/G)`` chunks instead of the full static capacity. Empty tiles
   cost ~nothing — for a centered subject (the usual animal-on-background
   frame) this is a large win a jit'd scan cannot express.
2. **VMEM-resident compositing.** The [G, pixels] alpha/transmittance
   temporaries never touch HBM. The backward pass stores NOTHING from the
   forward: it first re-walks the chunks forward, parking the chunk-boundary
   transmittances in a VMEM scratch, then walks them in reverse carrying the
   per-pixel suffix sum — O(pixels) state, zero HBM residuals.

The math is identical to the XLA path (same cumprod transmittance, same
gsplat clamp/skip/early-stop semantics, same hand-derived backward; see
``rasterize.py``) — tests assert both paths agree to float32 precision.

Layouts: pixels are flattened per tile to a [1, P] lane vector (P = th*tw,
a multiple of 128); Gaussian chunks are [G, P] blocks; per-tile features are
a packed [K, 16] array.

Feature packing (conic / 3D mode):
    0: mean_x  1: mean_y  2: conic_a  3: conic_b  4: conic_c
    6: opacity  7..9: rgb
Ellipse / 2D mode:
    0: mean_x  1: mean_y  2: cos(theta)  3: sin(theta)  4: sx  5: sy
    6: opacity  7..9: rgb
Gradient outputs use the same columns.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_CLAMP = 0.999
ALPHA_SKIP = 1.0 / 255.0
STOP_T = 1e-4

F = 16  # packed feature columns (lane-padded by Mosaic anyway)


def _pixel_coords(origins_ref, t, tw, P, pixel_offset):
    """xs, ys [1, P] for tile t (origins [T, 2] = (y0, x0), prefetched)."""
    y0 = origins_ref[t, 0].astype(jnp.float32)
    x0 = origins_ref[t, 1].astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    xs = x0 + (idx % tw).astype(jnp.float32) + pixel_offset
    ys = y0 + (idx // tw).astype(jnp.float32) + pixel_offset
    return xs, ys


def _chunk_alpha(mode, f, xs, ys, count, g0, G, P):
    """Alpha [G, P] for one chunk plus backward-chain auxiliaries."""
    mean_x = f[:, 0:1]
    mean_y = f[:, 1:2]
    dx = xs - mean_x  # [G, P]
    dy = ys - mean_y
    opacity = f[:, 6:7]
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (G, P), 0) + g0) < count

    if mode == "conic":
        A = f[:, 2:3]
        B = f[:, 3:4]
        C = f[:, 4:5]
        sigma = 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy
        e = jnp.exp(-sigma)
        raw = opacity * e
        a = jnp.minimum(ALPHA_CLAMP, raw)
        live = (sigma >= 0) & (raw >= ALPHA_SKIP) & rowmask
        a = jnp.where(live, a, 0.0)
        flow = live & (raw < ALPHA_CLAMP)  # gradient passes the clamp here
        return a, (dx, dy, e, raw, flow)
    else:  # ellipse
        c = f[:, 2:3]
        s = f[:, 3:4]
        sx = f[:, 4:5]
        sy = f[:, 5:6]
        u = c * dx + s * dy
        v = -s * dx + c * dy
        sx2 = 2.0 * sx * sx + 1e-8
        sy2 = 2.0 * sy * sy + 1e-8
        e = jnp.exp(-(u * u / sx2 + v * v / sy2))
        a = jnp.where(rowmask, opacity * e, 0.0)
        return a, (dx, dy, u, v, e, sx2, sy2, rowmask)


def _cumprod0(x):
    """Inclusive cumprod along axis 0 via a Hillis-Steele doubling scan
    (Mosaic has no cumprod lowering; log2(G) shift+multiply rounds)."""
    g = x.shape[0]
    d = 1
    while d < g:
        shifted = jnp.concatenate([jnp.ones_like(x[:d]), x[:-d]], axis=0)
        x = x * shifted
        d *= 2
    return x


def _cumsum0(x):
    """Inclusive cumsum along axis 0 (doubling scan)."""
    g = x.shape[0]
    d = 1
    while d < g:
        shifted = jnp.concatenate([jnp.zeros_like(x[:d]), x[:-d]], axis=0)
        x = x + shifted
        d *= 2
    return x


def _excl_cumprod_rows(x):
    cp = _cumprod0(x)
    excl = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
    return excl, cp


# ----------------------------------------------------------------------------
# Forward kernel
# ----------------------------------------------------------------------------

def _fwd_kernel(counts_ref, origins_ref, feats_ref, rgb_ref, alpha_ref,
                acc_ref, t_ref,
                *, mode, G, P, tw, early_stop, pixel_offset):
    t = pl.program_id(0)
    count = counts_ref[t]
    xs, ys = _pixel_coords(origins_ref, t, tw, P, pixel_offset)

    acc_ref[...] = jnp.zeros((4, P), jnp.float32)  # r, g, b, alpha
    t_ref[...] = jnp.ones((1, P), jnp.float32)

    def body(i, _):
        g0 = i * G
        f = feats_ref[0, i, :, :].T  # [F, G] load -> [G, F]
        a, _aux = _chunk_alpha(mode, f, xs, ys, count, g0, G, P)
        T_in = t_ref[...]
        excl, cp = _excl_cumprod_rows(1.0 - a)
        T = T_in * excl  # [G, P]
        if early_stop:
            contrib = jnp.where(T * (1.0 - a) >= STOP_T, a * T, 0.0)
        else:
            contrib = a * T
        r = jnp.sum(contrib * f[:, 7:8], axis=0, keepdims=True)
        g = jnp.sum(contrib * f[:, 8:9], axis=0, keepdims=True)
        b = jnp.sum(contrib * f[:, 9:10], axis=0, keepdims=True)
        al = jnp.sum(contrib, axis=0, keepdims=True)
        acc_ref[...] += jnp.concatenate([r, g, b, al], axis=0)
        t_ref[...] = T_in * cp[-1:]
        return 0

    jax.lax.fori_loop(0, pl.cdiv(count, G), body, 0)
    rgb_ref[0, :, :] = acc_ref[0:3, :]
    alpha_ref[0, :, :] = acc_ref[3:4, :]


# ----------------------------------------------------------------------------
# Backward kernel
# ----------------------------------------------------------------------------

def _bwd_kernel(counts_ref, origins_ref, feats_ref, grgb_ref, galpha_ref,
                dfeats_ref, tb_ref, s_ref,
                *, mode, G, P, tw, early_stop, pixel_offset, n_chunks):
    t = pl.program_id(0)
    count = counts_ref[t]
    xs, ys = _pixel_coords(origins_ref, t, tw, P, pixel_offset)
    n_steps = pl.cdiv(count, G)

    dfeats_ref[...] = jnp.zeros(dfeats_ref.shape, dfeats_ref.dtype)

    # Pass A (forward): park chunk-boundary transmittances in VMEM scratch.
    def body_a(i, T_in):
        g0 = i * G
        f = feats_ref[0, i, :, :].T  # [G, F]
        a, _ = _chunk_alpha(mode, f, xs, ys, count, g0, G, P)
        tb_ref[i, :] = T_in[0, :]
        _, cp = _excl_cumprod_rows(1.0 - a)
        return T_in * cp[-1:]

    jax.lax.fori_loop(0, n_steps, body_a, jnp.ones((1, P), jnp.float32))

    # Pass B (reverse): suffix-sum carry + per-Gaussian gradient reductions.
    s_ref[...] = jnp.zeros((1, P), jnp.float32)
    g_r = grgb_ref[0, 0:1, :]
    g_g = grgb_ref[0, 1:2, :]
    g_b = grgb_ref[0, 2:3, :]
    g_a = galpha_ref[0, 0:1, :]

    def body_b(k, _):
        i = n_steps - 1 - k
        g0 = i * G
        f = feats_ref[0, i, :, :].T  # [G, F]
        a, aux = _chunk_alpha(mode, f, xs, ys, count, g0, G, P)
        T_start = tb_ref[i, :][None, :]  # [1, P]
        excl, _ = _excl_cumprod_rows(1.0 - a)
        T = T_start * excl
        if early_stop:
            keep = (T * (1.0 - a) >= STOP_T).astype(jnp.float32)
        else:
            keep = jnp.ones_like(a)
        contrib = a * T * keep
        w = (g_r * f[:, 7:8] + g_g * f[:, 8:9] + g_b * f[:, 9:10] + g_a)
        wc = w * contrib  # [G, P]
        # Exclusive suffix within the chunk + carry from later chunks.
        csum = _cumsum0(wc)
        suffix = csum[-1:] - csum  # Σ_{j > i in chunk}
        s_i = s_ref[...] + suffix
        da = w * T * keep - s_i / (1.0 - a)

        # Chain into feature gradients (reduce over pixels → [G, 1]).
        dcol_r = jnp.sum(g_r * contrib, axis=1, keepdims=True)
        dcol_g = jnp.sum(g_g * contrib, axis=1, keepdims=True)
        dcol_b = jnp.sum(g_b * contrib, axis=1, keepdims=True)

        if mode == "conic":
            dx, dy, e, raw, flow = aux
            flow_f = flow.astype(jnp.float32)
            da_f = da * flow_f
            dop = jnp.sum(e * da_f, axis=1, keepdims=True)
            dsigma = -raw * da_f
            dA = jnp.sum(0.5 * dx * dx * dsigma, axis=1, keepdims=True)
            dB = jnp.sum(dx * dy * dsigma, axis=1, keepdims=True)
            dC = jnp.sum(0.5 * dy * dy * dsigma, axis=1, keepdims=True)
            A = f[:, 2:3]
            B = f[:, 3:4]
            C = f[:, 4:5]
            dmx = jnp.sum(-(A * dx + B * dy) * dsigma, axis=1, keepdims=True)
            dmy = jnp.sum(-(C * dy + B * dx) * dsigma, axis=1, keepdims=True)
            grads = jnp.concatenate(
                [dmx, dmy, dA, dB, dC, jnp.zeros_like(dop), dop,
                 dcol_r, dcol_g, dcol_b,
                 jnp.zeros((da.shape[0], F - 10), jnp.float32)], axis=1)
        else:
            dx, dy, u, v, e, sx2, sy2, rowmask = aux
            opacity = f[:, 6:7]
            msk = rowmask.astype(jnp.float32)
            da_m = da * msk
            dop = jnp.sum(e * da_m, axis=1, keepdims=True)
            dE = opacity * da_m  # d a / d e
            # e = exp(-(u²/sx2 + v²/sy2))
            de_du = e * (-2.0 * u / sx2)
            de_dv = e * (-2.0 * v / sy2)
            du = dE * de_du
            dv = dE * de_dv
            c = f[:, 2:3]
            s = f[:, 3:4]
            sx = f[:, 4:5]
            sy = f[:, 5:6]
            dcos = jnp.sum(du * dx + dv * dy, axis=1, keepdims=True)
            dsin = jnp.sum(du * dy - dv * dx, axis=1, keepdims=True)
            dmx = jnp.sum(-(du * c - dv * s), axis=1, keepdims=True)
            dmy = jnp.sum(-(du * s + dv * c), axis=1, keepdims=True)
            # d e / d sx2 = e * u² / sx2²;  d sx2/d sx = 4 sx
            dsx = jnp.sum(dE * e * (u * u / (sx2 * sx2)), axis=1,
                          keepdims=True) * 4.0 * sx
            dsy = jnp.sum(dE * e * (v * v / (sy2 * sy2)), axis=1,
                          keepdims=True) * 4.0 * sy
            grads = jnp.concatenate(
                [dmx, dmy, dcos, dsin, dsx, dsy, dop,
                 dcol_r, dcol_g, dcol_b,
                 jnp.zeros((da.shape[0], F - 10), jnp.float32)], axis=1)

        dfeats_ref[0, i, :, :] = grads.T
        s_ref[...] += csum[-1:]
        return 0

    jax.lax.fori_loop(0, n_steps, body_b, 0)


# ----------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ----------------------------------------------------------------------------

def _forward_call(packed, counts, origins, *, mode, tile_shape, early_stop,
                  pixel_offset, chunk):
    T_tiles, n_chunks, _, G = packed.shape
    th, tw = tile_shape
    P = th * tw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[pl.BlockSpec((1, n_chunks, F, G), lambda t, c, o: (t, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda t, c, o: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c, o: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, mode=mode, G=G, P=P, tw=tw,
        early_stop=early_stop, pixel_offset=pixel_offset,
    )
    rgb, alpha = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, P), jnp.float32),
        ],
    )(counts, origins, packed)
    return rgb, alpha[:, 0, :]


def _backward_call(packed, counts, origins, g_rgb, g_alpha, *, mode,
                   tile_shape, early_stop, pixel_offset, chunk):
    T_tiles, n_chunks, _, G = packed.shape
    th, tw = tile_shape
    P = th * tw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((1, n_chunks, F, G), lambda t, c, o: (t, 0, 0, 0)),
            pl.BlockSpec((1, 3, P), lambda t, c, o: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, c, o: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_chunks, F, G), lambda t, c, o: (t, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_chunks, P), jnp.float32),  # chunk-boundary T
            pltpu.VMEM((1, P), jnp.float32),  # suffix carry
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, mode=mode, G=G, P=P, tw=tw,
        early_stop=early_stop, pixel_offset=pixel_offset, n_chunks=n_chunks,
    )
    dfeats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T_tiles, n_chunks, F, G), jnp.float32)],
    )(counts, origins, packed, g_rgb, g_alpha[:, None, :])
    return dfeats[0]


_CACHE: dict = {}


def _make_tiled_compositor(mode, tile_shape, early_stop, pixel_offset, chunk):
    key = (mode, tile_shape, early_stop, pixel_offset, chunk)
    if key in _CACHE:
        return _CACHE[key]

    @jax.custom_vjp
    def compose(packed, counts, origins):
        return _forward_call(
            packed, counts, origins, mode=mode, tile_shape=tile_shape,
            early_stop=early_stop, pixel_offset=pixel_offset, chunk=chunk)

    def fwd(packed, counts, origins):
        out = compose(packed, counts, origins)
        return out, (packed, counts, origins)

    def bwd(res, g):
        packed, counts, origins = res
        g_rgb, g_alpha = g
        dpacked = _backward_call(
            packed, counts, origins, g_rgb, g_alpha, mode=mode,
            tile_shape=tile_shape, early_stop=early_stop,
            pixel_offset=pixel_offset, chunk=chunk)
        return (dpacked,
                np.zeros(counts.shape, dtype=jax.dtypes.float0),
                np.zeros(origins.shape, dtype=jax.dtypes.float0))

    compose.defvjp(fwd, bwd)
    _CACHE[key] = compose
    return compose


# ----------------------------------------------------------------------------
# Public entry: tiled composite from gathered per-tile features.
# ----------------------------------------------------------------------------

def pack_conic(mean2d, conic, opacity, colors):
    """[.., 2],[.., 3],[..],[.., 3] → [.., 16] packed features."""
    pads = jnp.zeros(mean2d.shape[:-1] + (F - 10,), mean2d.dtype)
    return jnp.concatenate([
        mean2d, conic, jnp.zeros_like(opacity[..., None]),
        opacity[..., None], colors, pads,
    ], axis=-1)


def pack_ellipse(mean2d, scales2d, theta, opacity, colors):
    pads = jnp.zeros(mean2d.shape[:-1] + (F - 10,), mean2d.dtype)
    return jnp.concatenate([
        mean2d, jnp.cos(theta)[..., None], jnp.sin(theta)[..., None],
        scales2d, opacity[..., None], colors, pads,
    ], axis=-1)


_WARMED: set = set()


def _warm_kernels(shape, tile_shape, mode, early_stop, pixel_offset, chunk):
    """Compile the fwd/bwd kernels once OUTSIDE custom_vjp.

    Workaround for this environment's remote-compile service: a pallas_call
    whose first compilation happens under the custom_vjp machinery deadlocks;
    compiling the identical kernel eagerly first populates the compile cache
    and the custom_vjp path then proceeds normally. Zero-cost after the first
    call per shape configuration. Only needed (and only run) on real TPU.
    """
    if jax.default_backend() != "tpu":
        return
    key = (shape, tile_shape, mode, early_stop, pixel_offset, chunk)
    if key in _WARMED:
        return
    _WARMED.add(key)
    T_tiles = shape[0]
    th, tw = tile_shape
    P = th * tw
    packed = jnp.zeros(shape, jnp.float32)
    counts = jnp.zeros((T_tiles,), jnp.int32)
    origins = jnp.zeros((T_tiles, 2), jnp.int32)
    rgb, alpha = _forward_call(
        packed, counts, origins, mode=mode, tile_shape=tile_shape,
        early_stop=early_stop, pixel_offset=pixel_offset, chunk=chunk)
    _backward_call(
        packed, counts, origins, rgb, alpha, mode=mode,
        tile_shape=tile_shape, early_stop=early_stop,
        pixel_offset=pixel_offset, chunk=chunk)


def composite_tiles_pallas(
    packed_tiles: jnp.ndarray,  # [T, n_chunks, 16, G] pre-chunked features
    counts: jnp.ndarray,  # [T] int32 live-prefix lengths
    origins: jnp.ndarray,  # [T, 2] int32 (y0, x0)
    tile_shape: Tuple[int, int],
    mode: str,  # "conic" | "ellipse"
    early_stop: bool,
    pixel_offset: float,
    chunk: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns rgb [T, 3, P], alpha [T, P]."""
    _warm_kernels(tuple(packed_tiles.shape), tile_shape, mode, early_stop,
                  pixel_offset, chunk)
    compose = _make_tiled_compositor(mode, tile_shape, early_stop,
                                     pixel_offset, chunk)
    return compose(packed_tiles, counts.astype(jnp.int32),
                   origins.astype(jnp.int32))
