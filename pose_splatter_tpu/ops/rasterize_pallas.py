"""Pallas TPU kernels for tiled Gaussian compositing.

Why Pallas on top of the XLA scan path (``rasterize.py``):

1. **No per-tile gather.** The packed, depth-sorted Gaussian array is small
   (N·16 floats — 1 MB at N=16k), so the WHOLE array is kept VMEM-resident
   as a single block shared by every tile. Tiles address Gaussian chunks
   through a scalar-prefetched per-tile *chunk list*; the per-Gaussian
   tile-intersection test runs in-kernel (features carry the bin radius),
   reproducing the XLA path's binning semantics exactly without ever
   materializing [tiles, capacity, features] in HBM. Binning on the host
   side reduces to a chunk-granularity argsort ([T, N/G] instead of
   [T, N] — ~G× cheaper).
2. **Per-tile dynamic trip counts + transmittance early-exit.** Each tile
   walks only its live chunks (count via scalar prefetch), and in 3D mode
   the walk BREAKS once every pixel's transmittance is below the 1e-4
   stop threshold — later contributions are exactly zero (gsplat's
   per-pixel stop, hoisted to the chunk level). Dense front-to-back tiles
   typically run 1-3 chunks instead of capacity/G.
3. **Single-pass backward from stored chunk boundaries.** When taking
   gradients, the forward also emits each tile's chunk-boundary
   transmittances ([live_chunks, pixels] — a small HBM round-trip) plus
   the early-stop chunk index; the backward walks the live chunks once in
   reverse using the exact stored boundaries, carrying the per-pixel
   suffix sum. (Reconstructing T by division — gsplat's backward
   identity — is NOT viable here: past a pixel's stop point T keeps
   decaying and underflows f32 at production depths, and 0/Π(1-a)=0
   silently kills the gradients of every earlier Gaussian on that pixel.)
   Feature gradients accumulate into a VMEM-resident [N, 16] block across
   all tiles (constant output index map).

The math is identical to the XLA path (same cumprod transmittance, same
gsplat clamp/skip/early-stop semantics, same hand-derived backward; see
``rasterize.py``) — tests assert both paths agree to float32 precision.

Layouts: pixels are flattened per tile to a [1, P] lane vector (P = th*tw,
a multiple of 128); Gaussian chunks are [G, P] blocks; features are packed
[n_chunks, 16, G] (chunk-major so a chunk is one dynamic leading-dim slice).

Feature packing (conic / 3D mode):
    0: mean_x  1: mean_y  2: conic_a  3: conic_b  4: conic_c
    6: opacity  7..9: rgb  10: bin radius (px)
Ellipse / 2D mode:
    0: mean_x  1: mean_y  2: cos(theta)  3: sin(theta)  4: sx  5: sy
    6: opacity  7..9: rgb  10: bin radius (px)
Rows are zero-sanitized for invalid Gaussians (zero opacity/radius make
them inert in both modes and in both passes). Gradient outputs use the
same columns (radius slot always zero).
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

# The packed array is VMEM-resident; cap its footprint (N * F * 4 bytes).
MAX_RESIDENT_GAUSSIANS = 65536

# Usable VMEM budget for the backward kernel's resident blocks (packed +
# dfeats + the per-tile chunk-boundary block + chunk temporaries), with
# headroom for Mosaic's own buffers. 16 MB/core is the hardware size.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(n: int, chunk: int, tile_shape: Tuple[int, int]) -> bool:
    """Whether the pallas path's VMEM-resident working set fits.

    packed [n_chunks, F, G] + dfeats (same) + tbounds block [c_max, P]
    + ~12 [G, P] f32 chunk temporaries.
    """
    th, tw = tile_shape
    p = th * tw
    n_chunks = -(-n // chunk)
    resident = 2 * n_chunks * F * chunk + n_chunks * p + 12 * chunk * p
    return n <= MAX_RESIDENT_GAUSSIANS and resident * 4 <= VMEM_BUDGET_BYTES


def _pixel_coords(origins_ref, t, tw, P, pixel_offset):
    """xs, ys [1, P] for tile t (origins [T, 2] = (y0, x0), prefetched)."""
    y0 = origins_ref[t, 0].astype(jnp.float32)
    x0 = origins_ref[t, 1].astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    xs = x0 + (idx % tw).astype(jnp.float32) + pixel_offset
    ys = y0 + (idx // tw).astype(jnp.float32) + pixel_offset
    return xs, ys


def _tile_mask(f, origins_ref, t, th, tw):
    """[G, 1] circle/AABB intersection test — identical to the XLA
    ``bin_gaussians`` test (sanitized rows have radius 0 → opacity 0)."""
    y0 = origins_ref[t, 0].astype(jnp.float32)
    x0 = origins_ref[t, 1].astype(jnp.float32)
    gx = f[:, 0:1]
    gy = f[:, 1:2]
    r = f[:, 10:11]
    return ((gx + r >= x0) & (gx - r < x0 + tw)
            & (gy + r >= y0) & (gy - r < y0 + th))


def _chunk_alpha(mode, f, xs, ys, tilemask):
    """Alpha [G, P] for one chunk plus backward-chain auxiliaries."""
    mean_x = f[:, 0:1]
    mean_y = f[:, 1:2]
    dx = xs - mean_x  # [G, P]
    dy = ys - mean_y
    opacity = f[:, 6:7]

    if mode == "conic":
        A = f[:, 2:3]
        B = f[:, 3:4]
        C = f[:, 4:5]
        sigma = 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy
        e = jnp.exp(-sigma)
        raw = opacity * e
        a = jnp.minimum(ALPHA_CLAMP, raw)
        live = (sigma >= 0) & (raw >= ALPHA_SKIP) & tilemask
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
        a = jnp.where(tilemask, opacity * e, 0.0)
        return a, (dx, dy, u, v, e, sx2, sy2, tilemask)


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

def _fwd_kernel(chunks_ref, nlive_ref, origins_ref, feats_ref,
                rgb_ref, alpha_ref, jstop_ref, tbounds_ref, acc_ref, t_ref,
                *, mode, G, P, th, tw, early_stop, pixel_offset,
                with_residuals):
    t = pl.program_id(0)
    xs, ys = _pixel_coords(origins_ref, t, tw, P, pixel_offset)

    acc_ref[...] = jnp.zeros((4, P), jnp.float32)  # r, g, b, alpha
    t_ref[...] = jnp.ones((1, P), jnp.float32)

    def chunk_body(j):
        c = chunks_ref[t, j]
        f = feats_ref[c, :, :].T  # [F, G] load -> [G, F]
        tilemask = _tile_mask(f, origins_ref, t, th, tw)
        a, _aux = _chunk_alpha(mode, f, xs, ys, tilemask)
        T_in = t_ref[...]
        if with_residuals:
            tbounds_ref[0, j, :] = T_in[0, :]
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
        T_out = T_in * cp[-1:]
        t_ref[...] = T_out
        return T_out

    n_steps = nlive_ref[t]
    if early_stop:
        # Once every pixel's transmittance is below STOP_T all later
        # contributions are exactly zero (T only decreases and the forward
        # masks on T*(1-a) >= STOP_T) — break out of the chunk walk. On
        # front-to-back scenes this skips the vast majority of chunks.
        def cond(c):
            j, alive = c
            return jnp.logical_and(j < n_steps, alive)

        def wbody(c):
            j, _ = c
            T_out = chunk_body(j)
            return j + 1, jnp.max(T_out) >= STOP_T

        j_stop, _ = jax.lax.while_loop(cond, wbody, (jnp.int32(0), True))
    else:
        jax.lax.fori_loop(0, n_steps, lambda j, _: (chunk_body(j), 0)[1], 0)
        j_stop = n_steps

    rgb_ref[0, :, :] = acc_ref[0:3, :]
    alpha_ref[0, :, :] = acc_ref[3:4, :]
    # Residual for the single-pass backward: where the walk stopped.
    jstop_ref[0, :, :] = jnp.full(jstop_ref.shape[1:], j_stop, jnp.int32)


# ----------------------------------------------------------------------------
# Backward kernel
# ----------------------------------------------------------------------------

def _bwd_kernel(chunks_ref, nlive_ref, origins_ref, feats_ref,
                grgb_ref, galpha_ref, jstop_ref, tbounds_ref,
                dfeats_ref, s_ref,
                *, mode, G, P, th, tw, early_stop, pixel_offset):
    t = pl.program_id(0)
    xs, ys = _pixel_coords(origins_ref, t, tw, P, pixel_offset)

    # Gradients accumulate across ALL tiles into the VMEM-resident block
    # (constant output index map → the block is only flushed at the end).
    @pl.when(t == 0)
    def _():
        dfeats_ref[...] = jnp.zeros(dfeats_ref.shape, dfeats_ref.dtype)

    # Single reverse pass over the chunks the forward actually walked,
    # reading the exact chunk-start transmittances it stored.
    n_live = jstop_ref[0, 0, 0]
    s_ref[...] = jnp.zeros((1, P), jnp.float32)
    g_r = grgb_ref[0, 0:1, :]
    g_g = grgb_ref[0, 1:2, :]
    g_b = grgb_ref[0, 2:3, :]
    g_a = galpha_ref[0, 0:1, :]

    def body_b(k, _):
        j = n_live - 1 - k
        c = chunks_ref[t, j]
        f = feats_ref[c, :, :].T  # [G, F]
        tilemask = _tile_mask(f, origins_ref, t, th, tw)
        a, aux = _chunk_alpha(mode, f, xs, ys, tilemask)
        excl, cp = _excl_cumprod_rows(1.0 - a)
        T_start = tbounds_ref[0, j, :][None, :]  # [1, P]
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
            dx, dy, u, v, e, sx2, sy2, tilemask_ = aux
            opacity = f[:, 6:7]
            msk = tilemask_.astype(jnp.float32)
            da_m = da * msk
            dop = jnp.sum(e * da_m, axis=1, keepdims=True)
            dE = opacity * da_m  # d a / d e
            # e = exp(-(u²/sx2 + v²/sy2))
            de_du = e * (-2.0 * u / sx2)
            de_dv = e * (-2.0 * v / sy2)
            du = dE * de_du
            dv = dE * de_dv
            c_ = f[:, 2:3]
            s = f[:, 3:4]
            sx = f[:, 4:5]
            sy = f[:, 5:6]
            dcos = jnp.sum(du * dx + dv * dy, axis=1, keepdims=True)
            dsin = jnp.sum(du * dy - dv * dx, axis=1, keepdims=True)
            dmx = jnp.sum(-(du * c_ - dv * s), axis=1, keepdims=True)
            dmy = jnp.sum(-(du * s + dv * c_), axis=1, keepdims=True)
            # d e / d sx2 = e * u² / sx2²;  d sx2/d sx = 4 sx
            dsx = jnp.sum(dE * e * (u * u / (sx2 * sx2)), axis=1,
                          keepdims=True) * 4.0 * sx
            dsy = jnp.sum(dE * e * (v * v / (sy2 * sy2)), axis=1,
                          keepdims=True) * 4.0 * sy
            grads = jnp.concatenate(
                [dmx, dmy, dcos, dsin, dsx, dsy, dop,
                 dcol_r, dcol_g, dcol_b,
                 jnp.zeros((da.shape[0], F - 10), jnp.float32)], axis=1)

        dfeats_ref[c, :, :] += grads.T
        s_ref[...] += csum[-1:]
        return 0

    jax.lax.fori_loop(0, n_live, body_b, 0)


# ----------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ----------------------------------------------------------------------------

def _forward_call(packed, chunks, nlive, origins, *, mode, tile_shape,
                  early_stop, pixel_offset, with_residuals):
    """Returns (rgb [T,3,P], alpha [T,P], jstop [T,1,128],
    tbounds [T,C_max,P] — garbage [T,1,128] when not with_residuals)."""
    n_chunks, _, G = packed.shape
    T_tiles = origins.shape[0]
    C_max = chunks.shape[1]
    th, tw = tile_shape
    P = th * tw
    tb_shape = (C_max, P) if with_residuals else (1, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((n_chunks, F, G), lambda t, cl, nl, o: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda t, cl, nl, o: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, cl, nl, o: (t, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda t, cl, nl, o: (t, 0, 0)),
            pl.BlockSpec((1,) + tb_shape, lambda t, cl, nl, o: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, mode=mode, G=G, P=P, th=th, tw=tw,
        early_stop=early_stop, pixel_offset=pixel_offset,
        with_residuals=with_residuals,
    )
    rgb, alpha, jstop, tbounds = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((T_tiles,) + tb_shape, jnp.float32),
        ],
    )(chunks, nlive, origins, packed)
    return rgb, alpha[:, 0, :], jstop, tbounds


def _backward_call(packed, chunks, nlive, origins, jstop, tbounds,
                   g_rgb, g_alpha, *, mode, tile_shape, early_stop,
                   pixel_offset):
    n_chunks, _, G = packed.shape
    T_tiles = origins.shape[0]
    C_max = chunks.shape[1]
    th, tw = tile_shape
    P = th * tw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec((n_chunks, F, G), lambda t, cl, nl, o: (0, 0, 0)),
            pl.BlockSpec((1, 3, P), lambda t, cl, nl, o: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, cl, nl, o: (t, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda t, cl, nl, o: (t, 0, 0)),
            pl.BlockSpec((1, C_max, P), lambda t, cl, nl, o: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n_chunks, F, G), lambda t, cl, nl, o: (0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),  # suffix carry
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, mode=mode, G=G, P=P, th=th, tw=tw,
        early_stop=early_stop, pixel_offset=pixel_offset,
    )
    dfeats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_chunks, F, G), jnp.float32)],
    )(chunks, nlive, origins, packed, g_rgb, g_alpha[:, None, :],
      jstop, tbounds)
    return dfeats[0]


_CACHE: dict = {}


def _make_tiled_compositor(mode, tile_shape, early_stop, pixel_offset):
    key = (mode, tile_shape, early_stop, pixel_offset)
    if key in _CACHE:
        return _CACHE[key]

    @jax.custom_vjp
    def compose(packed, chunks, nlive, origins):
        rgb, alpha, _, _ = _forward_call(
            packed, chunks, nlive, origins, mode=mode, tile_shape=tile_shape,
            early_stop=early_stop, pixel_offset=pixel_offset,
            with_residuals=False)
        return rgb, alpha

    def fwd(packed, chunks, nlive, origins):
        rgb, alpha, jstop, tbounds = _forward_call(
            packed, chunks, nlive, origins, mode=mode, tile_shape=tile_shape,
            early_stop=early_stop, pixel_offset=pixel_offset,
            with_residuals=True)
        return (rgb, alpha), (packed, chunks, nlive, origins, jstop, tbounds)

    def bwd(res, g):
        packed, chunks, nlive, origins, jstop, tbounds = res
        g_rgb, g_alpha = g
        dpacked = _backward_call(
            packed, chunks, nlive, origins, jstop, tbounds, g_rgb, g_alpha,
            mode=mode, tile_shape=tile_shape, early_stop=early_stop,
            pixel_offset=pixel_offset)
        return (dpacked,
                np.zeros(chunks.shape, dtype=jax.dtypes.float0),
                np.zeros(nlive.shape, dtype=jax.dtypes.float0),
                np.zeros(origins.shape, dtype=jax.dtypes.float0))

    compose.defvjp(fwd, bwd)
    _CACHE[key] = compose
    return compose


# ----------------------------------------------------------------------------
# Public entry: tiled composite of the (depth-ordered) global Gaussian list.
# ----------------------------------------------------------------------------

def pack_conic(mean2d, conic, opacity, colors, radius):
    """[.., 2],[.., 3],[..],[.., 3],[..] → [.., 16] packed features."""
    pads = jnp.zeros(mean2d.shape[:-1] + (F - 11,), mean2d.dtype)
    return jnp.concatenate([
        mean2d, conic, jnp.zeros_like(opacity[..., None]),
        opacity[..., None], colors, radius[..., None], pads,
    ], axis=-1)


def pack_ellipse(mean2d, scales2d, theta, opacity, colors, radius):
    pads = jnp.zeros(mean2d.shape[:-1] + (F - 11,), mean2d.dtype)
    return jnp.concatenate([
        mean2d, jnp.cos(theta)[..., None], jnp.sin(theta)[..., None],
        scales2d, opacity[..., None], colors, radius[..., None], pads,
    ], axis=-1)


_WARMED: set = set()


def _warm_kernels(shape, c_max, n_tiles, tile_shape, mode, early_stop,
                  pixel_offset):
    """Compile the fwd/bwd kernels once OUTSIDE custom_vjp.

    Workaround for this environment's remote-compile service: a pallas_call
    whose first compilation happens under the custom_vjp machinery deadlocks;
    compiling the identical kernel eagerly first populates the compile cache
    and the custom_vjp path then proceeds normally. Zero-cost after the first
    call per shape configuration. Only needed (and only run) on real TPU.
    """
    if jax.default_backend() != "tpu":
        return
    key = (shape, c_max, n_tiles, tile_shape, mode, early_stop, pixel_offset)
    if key in _WARMED:
        return
    _WARMED.add(key)
    packed = jnp.zeros(shape, jnp.float32)
    chunks = jnp.zeros((n_tiles, c_max), jnp.int32)
    nlive = jnp.zeros((n_tiles,), jnp.int32)
    origins = jnp.zeros((n_tiles, 2), jnp.int32)
    _forward_call(
        packed, chunks, nlive, origins, mode=mode, tile_shape=tile_shape,
        early_stop=early_stop, pixel_offset=pixel_offset,
        with_residuals=False)
    rgb, alpha, jstop, tbounds = _forward_call(
        packed, chunks, nlive, origins, mode=mode, tile_shape=tile_shape,
        early_stop=early_stop, pixel_offset=pixel_offset,
        with_residuals=True)
    _backward_call(
        packed, chunks, nlive, origins, jstop, tbounds, rgb, alpha,
        mode=mode, tile_shape=tile_shape, early_stop=early_stop,
        pixel_offset=pixel_offset)


def composite_tiles_pallas(
    packed: jnp.ndarray,  # [n_chunks, 16, G] chunked global features
    chunks: jnp.ndarray,  # [T, C_max] int32 per-tile live chunk indices
    nlive: jnp.ndarray,  # [T] int32 live-chunk counts
    origins: jnp.ndarray,  # [T, 2] int32 (y0, x0)
    tile_shape: Tuple[int, int],
    mode: str,  # "conic" | "ellipse"
    early_stop: bool,
    pixel_offset: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns rgb [T, 3, P], alpha [T, P]."""
    _warm_kernels(tuple(packed.shape), chunks.shape[1], origins.shape[0],
                  tile_shape, mode, early_stop, pixel_offset)
    compose = _make_tiled_compositor(mode, tile_shape, early_stop,
                                     pixel_offset)
    return compose(packed, chunks.astype(jnp.int32),
                   nlive.astype(jnp.int32), origins.astype(jnp.int32))
