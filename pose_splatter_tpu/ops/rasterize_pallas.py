"""Pallas TPU kernels for tiled Gaussian compositing (v2: instance-binned).

The round-1 design kept the globally depth-sorted Gaussian array VMEM-resident
and walked *chunk lists* per tile. Its weakness: the global depth order
decorrelates from screen position, so on dense scenes every tile's chunk list
degenerates to ~all chunks (measured: 8152 live chunk-steps = 260k
Gaussian-slots for a 16k-Gaussian bench scene whose true per-tile
intersection count is only 46k). v2 is the gsplat binning design
(``/root/reference`` outsources this to the gsplat CUDA rasterizer —
`src/gaussian_renderer.py:196-208`) re-derived for TPU:

1. **Per-tile instance lists.** Each Gaussian is duplicated once per
   intersecting tile (circle/AABB test, identical to the XLA path's
   ``bin_gaussians``). Instances are laid out in one flat array, grouped by
   tile and depth-ordered (2D mode: input-ordered) within each tile, each
   tile's segment padded to the chunk size G so chunks never straddle tiles.
   No sort is needed: Gaussians arrive pre-ordered, so an exclusive cumsum
   of the [N, tiles] intersection one-hot gives each instance's slot
   directly (`_build_instances`).

2. **Manual double-buffered DMA chunk walk.** The kernel grid is one
   program per tile. Each program walks only its own segment
   (ceil(count/G) chunks), DMA-ing [G, F] feature chunks HBM→VMEM one
   ahead of compute. In 3D mode the walk BREAKS once every pixel's
   transmittance is below gsplat's 1e-4 stop threshold. Work is therefore
   proportional to the *true* tile-intersection count, exactly like the
   CUDA rasterizer — not to N or to a fixed capacity. There is no
   VMEM-resident global array, hence no resident-size cap.

3. **Disjoint gradient writes.** Every instance belongs to exactly one
   tile, so the backward writes each chunk's [G, F] feature gradients
   straight to HBM — no cross-tile accumulation, no atomics, no races.
   The caller reduces instance gradients back onto Gaussians with one
   gather + scatter-add (the adjoint of the instance gather, handled by
   XLA autodiff in ``rasterize.py``).

4. **Single-sweep reverse backward with stored chunk-entry
   transmittance.** The gradient of alpha i needs the suffix sum
   S_i = sum_{k>i} w_k*contrib_k, which a back-to-front walk accumulates
   naturally — IF the entry transmittance of every chunk is known. The
   forward kernel therefore stages each chunk's entry T (the [1, P]
   per-pixel carry) into row 0 of an [8, P] VMEM block and DMAs it to a
   per-chunk HBM slot (8-sublane padding satisfies Mosaic's DMA slice
   alignment, which rejects bare [1, P] rows; the 7 pad rows cost HBM
   capacity, not meaningful bandwidth). The backward then walks the
   tile's chunks ONCE in reverse, recomputing alphas/transmittance from
   the stored entry T (bit-identical to the forward — no division, so
   none of gsplat's T-reconstruction underflow past the stop point)
   while carrying the running suffix. This replaced a two-forward-sweep
   design (round 4) and cut the backward kernel ~40%.

The math is identical to the XLA path (``rasterize.py``): same cumprod
transmittance, same gsplat clamp/skip/early-stop semantics, same
hand-derived backward. Tests assert both paths agree to float32 precision.

Feature packing (conic / 3D mode):
    0: mean_x  1: mean_y  2: conic_a  3: conic_b  4: conic_c
    6: opacity  7..9: rgb
Ellipse / 2D mode:
    0: mean_x  1: mean_y  2: cos(theta)  3: sin(theta)  4: sx  5: sy
    6: opacity  7..9: rgb
Column 10 carries the binning radius on the *Gaussian* array (host side
only); instance rows are zero-sanitized for padding (zero opacity rows are
inert in both modes and both passes).
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

F = 16  # packed feature columns
# HBM DMA slices must span full 128-lane tiles, so the chunked instance
# array is stored at lane width FS (features in the first F columns).
FS = 128

# Max tiles a single Gaussian may be duplicated into. Spans beyond this are
# truncated and COUNTED (returned to the caller — no silent truncation).
# 8 covers a 3-sigma radius of ~14 px at the default (8, 128) tiles
# (2 columns x 4 rows); the binning slot-extraction loop and the slot
# scatter both scale linearly with it, so keep it tight — the overflow
# counter (training asserts it stays 0) catches scenes that out-span it.
DEFAULT_EXPAND = 8


# ----------------------------------------------------------------------------
# Host-side (XLA) instance binning.
# ----------------------------------------------------------------------------

_SCAN_BLOCK = 256


def _excl_cumsum_mxu(oh):
    """Exclusive cumsum of [N, T] f32 along axis 0 via blocked MXU matmuls.

    A strictly-lower-triangular [B, B] matmul gives each block's exclusive
    within-block prefix on the MXU; a tiny [nb, T] cumsum stitches blocks.
    The matmul operands are bf16 (values are exactly 0/1 so products are
    exact; accumulation is forced f32, and within-block sums ≤ B=256 are
    exactly representable) — halves the one-hot HBM traffic, which
    dominates this stage. Orders of magnitude faster than XLA's
    reduce-window cumsum at N ~ 10^4.
    """
    N, T = oh.shape
    B = _SCAN_BLOCK
    nb = -(-N // B)
    ohp = jnp.pad(oh, ((0, nb * B - N), (0, 0))).reshape(nb, B, T)
    ohp16 = ohp.astype(jnp.bfloat16)
    lower = jnp.asarray(np.tril(np.ones((B, B), np.float16), -1),
                        jnp.bfloat16)
    within = jax.lax.dot_general(
        lower, ohp16,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).transpose(1, 0, 2)  # [nb, B, T] exclusive within block, exact f32
    bsums = ohp.sum(axis=1)  # [nb, T]
    bexcl = jnp.cumsum(bsums, axis=0) - bsums
    excl = (bexcl[:, None, :] + within).reshape(nb * B, T)[:N]
    totals = bexcl[-1] + bsums[-1]
    return excl, totals


def _build_instances(center, radius, valid, n_ty, n_tx,
                     tile_shape: Tuple[int, int], expand: int, G: int,
                     mcap: int):
    """Bin one camera's Gaussians into per-tile instance slots.

    Gaussians must already be in compositing order (depth-sorted for 3D,
    input order for 2D); instances inherit that order within each tile.

    The instance array holds ``mcap`` rows (static, chosen by the caller
    via :func:`instance_rows`). Two finite capacities are truncated and
    COUNTED, never silent: Gaussians spanning more than ``expand`` tiles
    (truncated tile spans), and segment rows past ``mcap`` (whole tiles'
    tails dropped when the scene out-sizes the array).

    Returns:
        dest:     [N*expand] int32 — instance-array row per slot (out-of-
                  range rows are dropped by the scatter).
        src:      [N*expand] int32 — source Gaussian row.
        astarts:  [T] int32 — each tile's first row (multiple of G).
        counts:   [T] int32 — per-tile instance count (capacity-clamped).
        overflow: [] int32 — total instances dropped by either cap.
    """
    th, tw = tile_shape
    T = n_ty * n_tx
    N = center.shape[0]
    cx, cy = center[:, 0], center[:, 1]
    r = jnp.where(valid, radius, 0.0)
    overlap = (
        valid
        & (cx + r >= 0) & (cx - r < n_tx * tw)
        & (cy + r >= 0) & (cy - r < n_ty * th)
    )
    x0t = jnp.clip(jnp.floor((cx - r) / tw), 0, n_tx - 1).astype(jnp.int32)
    x1t = jnp.clip(jnp.floor((cx + r) / tw), 0, n_tx - 1).astype(jnp.int32)
    y0t = jnp.clip(jnp.floor((cy - r) / th), 0, n_ty - 1).astype(jnp.int32)
    y1t = jnp.clip(jnp.floor((cy + r) / th), 0, n_ty - 1).astype(jnp.int32)
    # NaN/inf centers (culled projections) fail the overlap test; clamp the
    # garbage spans they produce so the masked arithmetic below stays benign.
    wspan = jnp.maximum(x1t - x0t + 1, 1)
    hspan = jnp.maximum(y1t - y0t + 1, 1)
    span = jnp.where(overlap, wspan * hspan, 0)  # [N]
    span_c = jnp.minimum(span, expand)
    overflow_span = (span - span_c).sum()

    # Tile membership is a RECTANGLE per Gaussian: test each tile's (ty,tx)
    # against the rect directly — [N, T] elementwise, no [N, E, T] blowup.
    # The expand cap keeps only the first `expand` rect tiles in row-major
    # order, mirroring the slot enumeration below.
    tty = (jnp.arange(T, dtype=jnp.int32) // n_tx)[None, :]
    ttx = (jnp.arange(T, dtype=jnp.int32) % n_tx)[None, :]
    ry = tty - y0t[:, None]
    rx = ttx - x0t[:, None]
    in_rect = (
        overlap[:, None]
        & (ry >= 0) & (ry < hspan[:, None])
        & (rx >= 0) & (rx < wspan[:, None])
    )
    e_rm = ry * wspan[:, None] + rx  # row-major slot index within the rect
    oh = (in_rect & (e_rm < expand)).astype(jnp.float32)  # [N, T]

    # Instance slot within its tile = # earlier Gaussians hitting the same
    # tile: exclusive scan over the (pre-ordered) Gaussian axis.
    excl_f, counts_f = _excl_cumsum_mxu(oh)
    counts = counts_f.astype(jnp.int32)  # [T]
    nsteps = -(-counts // G)
    astarts = G * jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nsteps)]
    )  # [T+1]; entry T = total aligned rows needed

    # Capacity clamp: tiles whose aligned segment spills past mcap lose the
    # spilled tail (counted). astarts stays in-range so kernel chunk ids
    # never go out of bounds; clamped tiles have counts_c == 0.
    avail = jnp.clip(mcap - astarts[:T], 0, None)
    counts_c = jnp.minimum(counts, avail)
    overflow_cap = (counts - counts_c).sum()
    astarts_c = jnp.minimum(astarts[:T], max(mcap - G, 0))

    # Slot enumeration, mirroring the onehot's row-major rect order. The
    # per-slot row  dest[n,e] = astarts[tile] + excl[n,tile]  is extracted
    # from the [N, T] matrices with one masked reduction per slot index e
    # (selecting the tile whose rect slot equals e) — measured ~8x faster
    # on TPU than take_along_axis + a [N, E] gather of astarts. Biasing
    # rows by +1 folds the occupancy flag into the same reduction (0 ⇒
    # dead slot), halving the per-slot [N, T] passes.
    row_nt1 = astarts[None, :T].astype(jnp.float32) + excl_f + 1.0  # [N, T]
    oh_b = oh > 0
    dest_cols = []
    for ei in range(expand):  # unrolled: keeps temporaries at [N, T]
        sel_e = oh_b & (e_rm == ei)  # at most one True per row
        dest_cols.append(jnp.sum(jnp.where(sel_e, row_nt1, 0.0), axis=1))
    dest1 = jnp.stack(dest_cols, axis=1)  # [N, E]; 0 = dead slot
    ok = dest1 > 0
    dest_f = dest1 - 1.0
    gid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], ok.shape)
    e = jnp.arange(expand, dtype=jnp.int32)[None, :]
    # Dead slots get out-of-range rows (dropped by the scatter).
    dest = jnp.where(ok, dest_f.astype(jnp.int32), mcap + gid * expand + e)
    src = jnp.where(ok, gid, 0)
    return (dest.reshape(-1), src.reshape(-1), astarts_c,
            counts_c, overflow_span + overflow_cap)


def instance_rows(N: int, T: int, expand: int, G: int,
                  cap: int | None = None) -> int:
    """Static row count of the instance array: worst-case aligned segments
    (every Gaussian in ``expand`` tiles + per-tile alignment padding),
    optionally bounded by ``cap`` rows (overflow is counted, not silent)."""
    worst = -(-(N * expand) // G) * G + T * G
    if cap is None:
        return worst
    return min(worst, -(-cap // G) * G)


@jax.custom_vjp
def permute_rows(x, order):
    """``x[order]`` for a permutation ``order``, with a scatter-free VJP.

    XLA autodiff of take_along_axis emits a scatter-add (~ms-scale on TPU);
    a permutation's adjoint is just the gather by the inverse permutation,
    which we build with one cheap scalar scatter. Rows should be 128-lane
    padded — narrow row gathers lower ~100x slower on TPU.
    """
    return jnp.take(x, order, axis=0)


def _permute_rows_fwd(x, order):
    return jnp.take(x, order, axis=0), order


def _permute_rows_bwd(order, g):
    n = order.shape[0]
    inv = jnp.zeros((n,), order.dtype).at[order].set(
        jnp.arange(n, dtype=order.dtype), unique_indices=True)
    return jnp.take(g, inv, axis=0), None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_instances(packed, dest, src, mcap):
    """[N, F] packed Gaussians → [mcap, FS] lane-padded instance array.

    Materializes the per-tile instance layout the kernels DMA from
    (features in the first F columns, zeros beyond; padding rows all-zero).
    ``dest[k]``/``src[k]`` map slot k to instance row / source Gaussian;
    out-of-range ``dest`` rows are dropped.

    The slot map is inverted with one scalar scatter-set (unique indices,
    out-of-range dropped) and the rows are then GATHERED; the hand-written
    VJP reduces instance gradients back per-Gaussian with another gather
    (``dpacked[n] = Σ_e dinst[dest[n,e]]``). Measured on TPU v5e at the
    bench shape (N=16k, E=16, mcap=74k): scatter inversion 2.5 ms vs the
    previous sort + searchsorted inversion 12.5 ms (searchsorted lowers to
    a ~10 ms while-loop); a full row scatter would serialize (~1 s).
    """
    inv, _ = _invert_slots(dest, src, packed.shape[0], mcap)
    if packed.shape[1] != FS:  # accept pre-padded [N, FS] rows
        packed = jnp.concatenate(
            [packed, jnp.zeros((packed.shape[0], FS - packed.shape[1]),
                               packed.dtype)], axis=1)
    padded = jnp.concatenate(
        [packed, jnp.zeros((1, FS), packed.dtype)], axis=0)
    return padded[inv]


def _invert_slots(dest, src, n, mcap):
    """inv [mcap] int32 with inv[dest[k]] = src[k], else n (zero row)."""
    inv = jnp.full((mcap,), n, dtype=src.dtype).at[dest].set(
        src, mode="drop", unique_indices=True)
    return inv, inv != n


def _gather_instances_fwd(packed, dest, src, mcap):
    return gather_instances(packed, dest, src, mcap), (dest, packed.shape)


def _gather_instances_bwd(mcap, res, dinst):
    dest, (n, f) = res
    # Gather FULL 128-lane rows, reduce, then slice. Slicing lanes inside
    # the gather (``dinst[rows, :f]``) lowers to a misaligned 16-lane
    # gather that is ~100x slower on TPU (622 ms vs 6.5 ms at the bench
    # shape). Dead slots route to an appended all-zero row.
    rows = jnp.where(dest < mcap, dest, mcap)
    dpad = jnp.concatenate(
        [dinst, jnp.zeros((1, dinst.shape[1]), dinst.dtype)], axis=0)
    full = jnp.take(dpad, rows, axis=0)  # [N*E, FS] lane-aligned rows
    dpacked = full.reshape(n, -1, dinst.shape[1]).sum(axis=1)[:, :f]
    return dpacked, None, None


gather_instances.defvjp(_gather_instances_fwd, _gather_instances_bwd)


# ----------------------------------------------------------------------------
# In-kernel chunk math (shared fwd/bwd).
# ----------------------------------------------------------------------------

def _pixel_coords(origins_ref, t, tw, P, pixel_offset):
    """xs, ys [1, P] for tile t (origins [T, 2] = (y0, x0), prefetched)."""
    y0 = origins_ref[t, 0].astype(jnp.float32)
    x0 = origins_ref[t, 1].astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    xs = x0 + (idx % tw).astype(jnp.float32) + pixel_offset
    ys = y0 + (idx // tw).astype(jnp.float32) + pixel_offset
    return xs, ys


def _chunk_alpha(mode, f, xs, ys, rowmask):
    """Alpha [G, P] for one instance chunk plus backward auxiliaries.

    ``rowmask`` [G, 1] masks the segment-padding rows of the tile's final
    chunk (instances are exact — no in-kernel tile test is needed).
    """
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


def _cumsum0(x):
    """Inclusive cumsum along axis 0 (doubling scan). A triangular-matmul
    variant is NOT usable here: the v5e MXU runs f32 matmuls as bf16
    multi-pass decompositions, which costs ~3 decimal digits in the
    suffix sums (measured 3e-3 grad error in round 5)."""
    g = x.shape[0]
    d = 1
    while d < g:
        shifted = jnp.concatenate([jnp.zeros_like(x[:d]), x[:-d]], axis=0)
        x = x + shifted
        d *= 2
    return x


def _cumprod0(x):
    """Inclusive cumprod along axis 0 via a Hillis-Steele doubling scan
    (Mosaic has no cumprod lowering; log2(G) shift+multiply rounds).
    A log-space MXU matmul variant was measured ~15% faster in round 5
    but the TPU's approximate log/exp compound to ~1e-3 absolute error
    over 64-term products — outside the 1e-5 parity budget — so the
    exact scan stays.
    """
    g = x.shape[0]
    d = 1
    while d < g:
        shifted = jnp.concatenate([jnp.ones_like(x[:d]), x[:-d]], axis=0)
        x = x * shifted
        d *= 2
    return x


def _excl_cumprod_rows(x):
    cp = _cumprod0(x)
    excl = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
    return excl, cp


def _rowmask(G, count, j):
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
    return rows < (count - j * G)


# ----------------------------------------------------------------------------
# Forward kernel.
# ----------------------------------------------------------------------------

def _fwd_kernel(astarts_ref, counts_ref, origins_ref, inst_ref,
                rgb_ref, alpha_ref, jstop_ref, tb_ref,
                buf_ref, acc_ref, t_ref, tb_stage, in_sem, tb_sem,
                *, mode, G, P, th, tw, early_stop, pixel_offset,
                save_tbounds):
    t = pl.program_id(0)
    start = astarts_ref[t]
    count = counts_ref[t]
    n_steps = pl.cdiv(count, G)
    cbase = start // G  # this tile's first flat chunk id (start is G-aligned)
    xs, ys = _pixel_coords(origins_ref, t, tw, P, pixel_offset)

    acc_ref[...] = jnp.zeros((4, P), jnp.float32)  # r, g, b, alpha
    t_ref[...] = jnp.ones((1, P), jnp.float32)

    def in_dma(slot, j):
        return pltpu.make_async_copy(
            inst_ref.at[cbase + j], buf_ref.at[slot], in_sem.at[slot])

    def tb_dma(slot, j):
        return pltpu.make_async_copy(
            tb_stage.at[slot], tb_ref.at[cbase + j], tb_sem.at[slot])

    @pl.when(n_steps > 0)
    def _():
        in_dma(0, 0).start()

    def step(j):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_steps)
        def _():
            in_dma(1 - slot, j + 1).start()

        in_dma(slot, j).wait()
        f = buf_ref[slot]  # [G, F]
        a, _aux = _chunk_alpha(mode, f, xs, ys, _rowmask(G, count, j))
        T_in = t_ref[...]
        if save_tbounds:
            # Stage this chunk's ENTRY transmittance for the reverse-walk
            # backward (row 0 of an 8-sublane block; rows 1-7 are DMA
            # alignment padding).
            @pl.when(j >= 2)
            def _():
                tb_dma(slot, j - 2).wait()

            tb_stage[slot, 0:1, :] = T_in
            tb_dma(slot, j).start()
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

    if early_stop:
        def body(carry):
            j, _ = carry
            T_out = step(j)
            # Once every pixel's transmittance is below STOP_T all later
            # contributions are exactly zero — break out of the walk.
            return j + 1, jnp.max(T_out) >= STOP_T

        j_stop, _ = jax.lax.while_loop(
            lambda c: jnp.logical_and(c[0] < n_steps, c[1]),
            body, (jnp.int32(0), jnp.bool_(True)))
    else:
        # No early-out: a fori_loop avoids a bool loop carry (Mosaic fails
        # to verify an (i32, i1) scf.while under a vmapped grid).
        jax.lax.fori_loop(0, n_steps, lambda j, c: (step(j), c)[1], 0)
        j_stop = n_steps

    # Drain: an input DMA for chunk j_stop is in flight iff we early-stopped.
    @pl.when(j_stop < n_steps)
    def _():
        in_dma(jax.lax.rem(j_stop, 2), j_stop).wait()

    if save_tbounds:
        @pl.when(j_stop >= 1)
        def _():
            tb_dma(jax.lax.rem(j_stop - 1, 2), j_stop - 1).wait()

        @pl.when(j_stop >= 2)
        def _():
            tb_dma(jax.lax.rem(j_stop, 2), j_stop - 2).wait()

    rgb_ref[0, :, :] = acc_ref[0:3, :]
    alpha_ref[0, :, :] = acc_ref[3:4, :]
    jstop_ref[0, 0, :] = jnp.full((128,), j_stop, jnp.int32)


# ----------------------------------------------------------------------------
# Backward kernel.
# ----------------------------------------------------------------------------

def _bwd_kernel(astarts_ref, counts_ref, origins_ref, jstop_ref,
                inst_ref, tb_ref, grgb_ref, galpha_ref, dinit_ref,
                dinst_ref,
                buf_ref, gbuf_ref, tbbuf_ref, sfx_ref,
                in_sem, tb_sem, gw_sem,
                *, mode, G, P, th, tw, early_stop, pixel_offset):
    del dinit_ref  # aliased zeros: unwalked chunks keep their init
    t = pl.program_id(0)
    start = astarts_ref[t]
    count = counts_ref[t]
    j_stop = jstop_ref[t]
    cbase = start // G
    xs, ys = _pixel_coords(origins_ref, t, tw, P, pixel_offset)

    def in_dma(slot, j):
        return pltpu.make_async_copy(
            inst_ref.at[cbase + j], buf_ref.at[slot], in_sem.at[slot])

    def tb_dma(slot, j):
        return pltpu.make_async_copy(
            tb_ref.at[cbase + j], tbbuf_ref.at[slot], tb_sem.at[slot])

    def gw_dma(slot, j):
        return pltpu.make_async_copy(
            gbuf_ref.at[slot], dinst_ref.at[cbase + j], gw_sem.at[slot])

    # Chunks the forward never walked keep zero gradients: the output
    # buffer aliases an all-zero input (input_output_aliases), so only
    # walked chunks are written.

    g_r = grgb_ref[0, 0:1, :]
    g_g = grgb_ref[0, 1:2, :]
    g_b = grgb_ref[0, 2:3, :]
    g_a = galpha_ref[0, 0:1, :]

    # Single REVERSE sweep over the walked chunks. The suffix sum
    # S_i = Σ_{k>i} w_k·contrib_k accumulates naturally back-to-front;
    # each chunk's entry transmittance was stored by the forward
    # (bit-identical recompute — no division/underflow).
    sfx_ref[...] = jnp.zeros((1, P), jnp.float32)

    @pl.when(j_stop > 0)
    def _():
        in_dma(0, j_stop - 1).start()
        tb_dma(0, j_stop - 1).start()

    def sweep(jj, _):
        j = j_stop - 1 - jj  # reverse chunk order
        slot = jax.lax.rem(jj, 2)

        @pl.when(jj + 1 < j_stop)
        def _():
            in_dma(1 - slot, j - 1).start()
            tb_dma(1 - slot, j - 1).start()

        in_dma(slot, j).wait()
        tb_dma(slot, j).wait()
        f = buf_ref[slot]  # [G, F]
        T_in = tbbuf_ref[slot, 0:1, :]  # [1, P] entry transmittance
        a, aux = _chunk_alpha(mode, f, xs, ys, _rowmask(G, count, j))
        excl, cp = _excl_cumprod_rows(1.0 - a)
        T = T_in * excl
        if early_stop:
            keep = (T * (1.0 - a) >= STOP_T).astype(jnp.float32)
        else:
            keep = jnp.ones_like(a)
        contrib = a * T * keep
        w = (g_r * f[:, 7:8] + g_g * f[:, 8:9] + g_b * f[:, 9:10] + g_a)
        wc = w * contrib  # [G, P]
        # Within-chunk strict suffix + carry from later chunks.
        tot = jnp.sum(wc, axis=0, keepdims=True)
        incl = _cumsum0(wc)  # inclusive prefix through instance i
        s_i = sfx_ref[...] + (tot - incl)  # Σ_{k > i} w_k·contrib_k
        da = w * T * keep - s_i / (1.0 - a)

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
                 jnp.zeros((G, FS - 10), jnp.float32)], axis=1)
        else:
            dx, dy, u, v, e, sx2, sy2, rowmask_ = aux
            opacity = f[:, 6:7]
            msk = rowmask_.astype(jnp.float32)
            da_m = da * msk
            dop = jnp.sum(e * da_m, axis=1, keepdims=True)
            dE = opacity * da_m  # d a / d e
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
            dsx = jnp.sum(dE * e * (u * u / (sx2 * sx2)), axis=1,
                          keepdims=True) * 4.0 * sx
            dsy = jnp.sum(dE * e * (v * v / (sy2 * sy2)), axis=1,
                          keepdims=True) * 4.0 * sy
            grads = jnp.concatenate(
                [dmx, dmy, dcos, dsin, dsx, dsy, dop,
                 dcol_r, dcol_g, dcol_b,
                 jnp.zeros((G, FS - 10), jnp.float32)], axis=1)

        # Stage + write this chunk's gradients (rows are this tile's own).
        @pl.when(jj >= 2)
        def _():
            gw_dma(slot, j + 2).wait()

        gbuf_ref[slot] = grads
        gw_dma(slot, j).start()
        sfx_ref[...] += tot
        return 0

    jax.lax.fori_loop(0, j_stop, sweep, 0)

    # Drain the last two gradient writes (reverse walk ends at chunk 0).
    @pl.when(j_stop >= 1)
    def _():
        gw_dma(jax.lax.rem(j_stop - 1, 2), 0).wait()

    @pl.when(j_stop >= 2)
    def _():
        gw_dma(jax.lax.rem(j_stop, 2), 1).wait()

# ----------------------------------------------------------------------------
# pallas_call wrappers + custom VJP.
# ----------------------------------------------------------------------------

def _forward_call(inst, astarts, counts, origins, *, mode, tile_shape,
                  early_stop, pixel_offset, G, save_tbounds=False):
    """Returns (rgb [T,3,P], alpha [T,P], jstop [T], tbounds).

    ``inst`` is [n_chunks, G, FS] (chunked so HBM DMA slices stay tile-
    aligned). With ``save_tbounds`` each walked chunk's entry
    transmittance is written to ``tbounds[chunk, 0, :]`` ([n_chunks, 8, P]
    — 8-sublane padded for DMA alignment) for the reverse-walk backward;
    without it a dummy [1, 8, P] array is returned untouched.
    """
    T_tiles = origins.shape[0]
    th, tw = tile_shape
    P = th * tw
    n_chunks = inst.shape[0]
    tb_chunks = n_chunks if save_tbounds else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda t, a, c, o: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, a, c, o: (t, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda t, a, c, o: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # tbounds (manual DMA)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G, FS), jnp.float32),  # instance chunk buffers
            pltpu.VMEM((4, P), jnp.float32),      # rgb+alpha accumulator
            pltpu.VMEM((1, P), jnp.float32),      # transmittance state
            pltpu.VMEM((2, 8, P), jnp.float32),   # tbound staging
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, mode=mode, G=G, P=P, th=th, tw=tw,
        early_stop=early_stop, pixel_offset=pixel_offset,
        save_tbounds=save_tbounds,
    )
    rgb, alpha, jstop, tbounds = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((tb_chunks, 8, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(astarts, counts, origins, inst)
    return rgb, alpha[:, 0, :], jstop[:, 0, 0], tbounds


def _backward_call(inst, tbounds, astarts, counts, origins, jstop,
                   g_rgb, g_alpha, *, mode, tile_shape, early_stop,
                   pixel_offset, G):
    n_chunks = inst.shape[0]
    T_tiles = origins.shape[0]
    th, tw = tile_shape
    P = th * tw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # inst
            pl.BlockSpec(memory_space=pl.ANY),  # tbounds
            pl.BlockSpec((1, 3, P), lambda t, a, c, o, j: (t, 0, 0)),
            pl.BlockSpec((1, 1, P), lambda t, a, c, o, j: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # dinst init (aliased)
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, G, FS), jnp.float32),  # instance chunk buffers
            pltpu.VMEM((2, G, FS), jnp.float32),  # gradient staging
            pltpu.VMEM((2, 8, P), jnp.float32),   # tbound chunk buffers
            pltpu.VMEM((1, P), jnp.float32),      # suffix Σ w·contrib
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, mode=mode, G=G, P=P, th=th, tw=tw,
        early_stop=early_stop, pixel_offset=pixel_offset,
    )
    dinit = jnp.zeros((n_chunks, G, FS), jnp.float32)
    # Alias the zeros input onto the output so unwalked chunks stay zero
    # without a kernel-side zero-fill walk. dinit must be the LAST operand;
    # deriving its flat index from the tuple keeps the alias correct if
    # operands are ever added before it (inst at index 4 has the identical
    # shape/dtype, so a stale hardcoded index would silently alias the
    # wrong buffer).
    operands = (astarts, counts, origins, jstop, inst, tbounds,
                g_rgb, g_alpha[:, None, :], dinit)
    alias_idx = len(operands) - 1
    assert operands[alias_idx] is dinit
    dinst = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_chunks, G, FS), jnp.float32)],
        input_output_aliases={alias_idx: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*operands)
    return dinst[0]


_CACHE: dict = {}


def _make_compositor(mode, tile_shape, early_stop, pixel_offset, G):
    key = (mode, tile_shape, early_stop, pixel_offset, G)
    if key in _CACHE:
        return _CACHE[key]

    @jax.custom_vjp
    def compose(inst, astarts, counts, origins):
        rgb, alpha, _, _ = _forward_call(
            inst, astarts, counts, origins, mode=mode, tile_shape=tile_shape,
            early_stop=early_stop, pixel_offset=pixel_offset, G=G)
        return rgb, alpha

    def fwd(inst, astarts, counts, origins):
        rgb, alpha, jstop, tbounds = _forward_call(
            inst, astarts, counts, origins, mode=mode, tile_shape=tile_shape,
            early_stop=early_stop, pixel_offset=pixel_offset, G=G,
            save_tbounds=True)
        return (rgb, alpha), (inst, tbounds, astarts, counts, origins, jstop)

    def bwd(res, g):
        inst, tbounds, astarts, counts, origins, jstop = res
        g_rgb, g_alpha = g
        dinst = _backward_call(
            inst, tbounds, astarts, counts, origins, jstop, g_rgb, g_alpha,
            mode=mode, tile_shape=tile_shape, early_stop=early_stop,
            pixel_offset=pixel_offset, G=G)
        return (dinst,
                np.zeros(astarts.shape, dtype=jax.dtypes.float0),
                np.zeros(counts.shape, dtype=jax.dtypes.float0),
                np.zeros(origins.shape, dtype=jax.dtypes.float0))

    compose.defvjp(fwd, bwd)
    _CACHE[key] = compose
    return compose


# ----------------------------------------------------------------------------
# Public entry: instance-binned tiled composite.
# ----------------------------------------------------------------------------

def pack_conic(mean2d, conic, opacity, colors, radius):
    """[.., 2],[.., 3],[..],[.., 3],[..] -> [.., 16] packed features."""
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


def _warm_kernels(mcap, n_tiles, tile_shape, mode, early_stop, pixel_offset,
                  G):
    """Compile the fwd/bwd kernels once OUTSIDE custom_vjp.

    Workaround for this environment's remote-compile service: a pallas_call
    whose first compilation happens under the custom_vjp machinery
    deadlocks; compiling the identical kernel eagerly first populates the
    compile cache. Zero-cost after the first call per shape configuration.
    Only needed (and only run) on real TPU.
    """
    if jax.default_backend() != "tpu":
        return
    key = (mcap, n_tiles, tile_shape, mode, early_stop, pixel_offset, G)
    if key in _WARMED:
        return
    _WARMED.add(key)
    inst = jnp.zeros((mcap // G, G, FS), jnp.float32)
    astarts = jnp.zeros((n_tiles,), jnp.int32)
    counts = jnp.zeros((n_tiles,), jnp.int32)
    origins = jnp.zeros((n_tiles, 2), jnp.int32)
    _forward_call(
        inst, astarts, counts, origins, mode=mode, tile_shape=tile_shape,
        early_stop=early_stop, pixel_offset=pixel_offset, G=G)
    rgb, alpha, jstop, tbounds = _forward_call(
        inst, astarts, counts, origins, mode=mode, tile_shape=tile_shape,
        early_stop=early_stop, pixel_offset=pixel_offset, G=G,
        save_tbounds=True)
    _backward_call(
        inst, tbounds, astarts, counts, origins, jstop, rgb, alpha,
        mode=mode, tile_shape=tile_shape, early_stop=early_stop,
        pixel_offset=pixel_offset, G=G)


def composite_instances_pallas(
    inst: jnp.ndarray,      # [mcap, FS] lane-padded instance features
    astarts: jnp.ndarray,   # [T] int32 per-tile first row (G-aligned)
    counts: jnp.ndarray,    # [T] int32 per-tile true instance count
    origins: jnp.ndarray,   # [T, 2] int32 (y0, x0)
    tile_shape: Tuple[int, int],
    chunk: int,             # G: instance rows per DMA/compute step
    mode: str,              # "conic" | "ellipse"
    early_stop: bool,
    pixel_offset: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite per-tile instance segments. Returns rgb [T,3,P], alpha [T,P]."""
    if inst.shape[0] % chunk:
        raise ValueError("instance rows must be a multiple of chunk")
    if inst.shape[1] != FS:
        raise ValueError(f"instance features must be {FS}-lane padded")
    _warm_kernels(inst.shape[0], origins.shape[0], tile_shape, mode,
                  early_stop, pixel_offset, chunk)
    compose = _make_compositor(mode, tile_shape, early_stop, pixel_offset,
                               chunk)
    return compose(inst.reshape(-1, chunk, FS),
                   astarts.astype(jnp.int32),
                   counts.astype(jnp.int32), origins.astype(jnp.int32))
