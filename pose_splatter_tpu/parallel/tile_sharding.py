"""Tile-sharded rendering + the (data, tile) 2D-mesh train step.

The second mesh axis from SURVEY.md §5.8: Gaussians are small (≤16k × a few
floats — replicate them), pixels are big. Under ``shard_map`` each device
bins and composites its own subset of tiles (screen features replicated,
tile origins sharded) and the image strips are reassembled by the
``out_specs`` all-gather riding ICI.

Production features (round 3):
- **multi-camera**: ``viewmats [B,4,4] / Ks [B,3,3]`` — every camera's tiles
  shard over the same axis (the camera axis rides along replicated);
- **padding, not divisibility asserts**: the tile grid is padded with
  off-screen dummy tiles to a multiple of the axis size and the pad strips
  are dropped after reassembly;
- **Pallas compositor option**: each device feeds its local tile subset to
  the instance-binned TPU kernels (``compositor="pallas"``) instead of the
  XLA scan compositor;
- **(data, tile) train step**: :func:`make_tile_sharded_train_step` runs
  the full carve→U-Net→Gaussians→render→loss→grad pipeline with the frame
  batch sharded over ``data`` and every frame's pixel tiles sharded over
  ``tile``. Pixel-decomposable losses (IoU, masked L1) are computed from
  per-strip partial sums + one ``psum`` over the tile axis; SSIM (windowed,
  not strip-decomposable) uses one ``all_gather`` of the strips. Gradients
  psum over both axes — the pod-scale layout for the grid-256 high-res
  config (docs/DESIGN.md §4).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):  # new API: check_rep renamed to check_vma
        kw["check_vma"] = kw.pop("check_rep", True)
        return _shard_map(f, **kw)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from pose_splatter_tpu.ops.projection import project_gaussians
from pose_splatter_tpu.ops.rasterize import (
    _alpha_conic,
    _alpha_ellipse,
    _tile_grid,
    bin_gaussians,
    composite_pixels,
)


def _padded_origins(height, width, tile_shape, n_dev, row_aligned=False):
    """Tile origins padded with off-screen tiles to a multiple of n_dev.

    ``row_aligned`` pads whole TILE ROWS instead (tile-row count to a
    multiple of n_dev), so each device's shard is a contiguous horizontal
    image band — required by the strip-halo SSIM.
    """
    origins, n_ty, n_tx = _tile_grid(height, width, tile_shape)
    n_tiles = origins.shape[0]
    if row_aligned:
        n_ty_pad = -(-n_ty // n_dev) * n_dev
        pad = n_ty_pad * n_tx - n_tiles
    else:
        pad = (-n_tiles) % n_dev
    if pad:
        # Off-screen origins: no Gaussian's bbox reaches them, so they
        # composite pure background and are sliced off after reassembly.
        off = jnp.full((pad, 2), max(height, width) + 10 * max(tile_shape),
                       origins.dtype)
        origins = jnp.concatenate([origins, off], axis=0)
    return origins, n_ty, n_tx, pad


def _composite_local(origins_l, feats, cols, ok, center, radius, alpha_fn,
                     tile_shape, tile_capacity, chunk, early_stop,
                     pixel_offset, compositor):
    """Composite one camera's Gaussians onto this device's tile subset."""
    th, tw = tile_shape
    binning = bin_gaussians(center, radius, ok, origins_l, tile_shape,
                            tile_capacity)
    pix_dy = jnp.arange(th, dtype=jnp.float32) + pixel_offset
    pix_dx = jnp.arange(tw, dtype=jnp.float32) + pixel_offset
    yy, xx = jnp.meshgrid(pix_dy, pix_dx, indexing="ij")
    tys = origins_l[:, 0:1].astype(jnp.float32) + yy.reshape(1, -1)
    txs = origins_l[:, 1:2].astype(jnp.float32) + xx.reshape(1, -1)

    if compositor == "pallas":
        from pose_splatter_tpu.ops.rasterize_pallas import (
            FS, composite_instances_pallas, pack_conic, pack_ellipse,
        )

        K = binning.indices.shape[1]
        Kpad = -(-K // chunk) * chunk
        if alpha_fn is _alpha_conic:
            mean2d, conic, opac = feats
            packed = pack_conic(mean2d, conic, opac, cols, radius)
        else:
            mean2d, scales2d, theta, opac = feats
            packed = pack_ellipse(mean2d, scales2d, theta, opac, cols,
                                  radius)
        packed = jnp.where(ok[:, None], packed, 0.0)
        packed = jnp.concatenate(
            [packed, jnp.zeros((packed.shape[0], FS - packed.shape[1]))],
            axis=1)
        # Per-tile instance segments straight from the binning: the stable
        # argsort already packs intersecting Gaussians first, in
        # compositing order.
        inst = packed[binning.indices]  # [T_l, K, FS]
        inst = inst * binning.valid[..., None]
        inst = jnp.pad(inst, ((0, 0), (0, Kpad - K), (0, 0)))
        counts = binning.valid.sum(axis=1).astype(jnp.int32)
        T_l = origins_l.shape[0]
        astarts = (jnp.arange(T_l, dtype=jnp.int32) * Kpad)
        rgb_t, alpha_t = composite_instances_pallas(
            inst.reshape(T_l * Kpad, FS), astarts, counts,
            origins_l.astype(jnp.int32), tile_shape, chunk,
            "conic" if alpha_fn is _alpha_conic else "ellipse",
            early_stop, pixel_offset)
        return jnp.moveaxis(rgb_t, 1, 2), alpha_t

    feats_t = jax.tree.map(lambda x: x[binning.indices], tuple(feats))
    cols_t = cols[binning.indices]

    def per_tile(f, c, m, xs_, ys_):
        return composite_pixels(xs_, ys_, f, c, m, alpha_fn,
                                chunk=chunk, early_stop=early_stop)

    return jax.vmap(per_tile)(feats_t, cols_t, binning.valid, txs, tys)


def rasterize_tile_sharded(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    viewmats: jnp.ndarray,  # [B,4,4] camera batch (or [4,4])
    Ks: jnp.ndarray,  # [B,3,3] (or [3,3])
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "tile",
    valid: Optional[jnp.ndarray] = None,
    backgrounds: Optional[jnp.ndarray] = None,
    tile_shape: Tuple[int, int] = (32, 128),
    tile_capacity: int = 1024,
    chunk: int = 32,
    compositor: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3D rasterization with pixel tiles sharded over ``mesh[axis]``.

    Tile count is padded to the axis size (no divisibility requirement).
    Returns rgb [B,H,W,3], alpha [B,H,W] (leading axis squeezed if the
    cameras came in unbatched).
    """
    squeeze = viewmats.ndim == 2
    if squeeze:
        viewmats = viewmats[None]
        Ks = Ks[None]
    N = means.shape[0]
    B = viewmats.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)

    proj = jax.vmap(lambda v, k: project_gaussians(
        means, quats, scales, v, k, width, height))(viewmats, Ks)
    ok = proj.valid & valid[None]
    keys = jnp.where(ok, proj.depth, jnp.inf)
    order = jnp.argsort(keys, axis=1)

    def reorder(x):
        idx = order.reshape(order.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(
            x, jnp.broadcast_to(idx, order.shape + x.shape[2:]), axis=1)

    mean2d = reorder(proj.mean2d)
    conic = reorder(proj.conic)
    rad = reorder(proj.radius)
    ok_s = reorder(ok)
    opac = reorder(jnp.broadcast_to(opacities[None], (B, N)))
    cols = reorder(jnp.broadcast_to(colors[None], (B, N, 3)))

    th, tw = tile_shape
    n_dev = mesh.shape[axis]
    origins, n_ty, n_tx, pad = _padded_origins(height, width, tile_shape,
                                               n_dev)

    def local_tiles(origins_l, mean2d, conic, opac, cols, ok_s, rad):
        def one_cam(m2, cn, op, co, okc, rd):
            return _composite_local(
                origins_l, (m2, cn, op), co, okc, m2, rd, _alpha_conic,
                tile_shape, tile_capacity, chunk, True, 0.5, compositor)

        return jax.vmap(one_cam)(mean2d, conic, opac, cols, ok_s, rad)

    rgb_t, alpha_t = shard_map(
        local_tiles,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=(P(None, axis), P(None, axis)),
        check_rep=False,
    )(origins, mean2d, conic, opac, cols, ok_s, rad)

    T_real = n_ty * n_tx
    rgb_t = rgb_t[:, :T_real]
    alpha_t = alpha_t[:, :T_real]
    rgb = (
        rgb_t.reshape(B, n_ty, n_tx, th, tw, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, n_ty * th, n_tx * tw, 3)[:, :height, :width]
    )
    alpha = (
        alpha_t.reshape(B, n_ty, n_tx, th, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, n_ty * th, n_tx * tw)[:, :height, :width]
    )
    if backgrounds is not None:
        rgb = rgb + (1.0 - alpha[..., None]) * backgrounds.reshape(1, 1, 1, 3)
    if squeeze:
        rgb, alpha = rgb[0], alpha[0]
    return rgb, alpha


# ----------------------------------------------------------------------------
# Strip-halo windowed SSIM (no full-image all_gather).
# ----------------------------------------------------------------------------

def _ssim_band_partial(pred_t, tgt_t, tile_axis, n_tx, th, tw, H, W,
                       kernel_size=11, sigma=1.5, k1=0.01, k2=0.03,
                       data_range=1.0):
    """Per-device partial (sum, count) of the SSIM map over row-aligned
    tile strips.

    pred_t/tgt_t: [B, T_l, th*tw, 3] local strips forming a contiguous
    horizontal image band (requires ``_padded_origins(row_aligned=True)``).
    Each device evaluates exactly the SSIM window positions whose top row
    lies in its band; the ``kernel_size-1`` halo rows come from the next
    device via ONE ppermute, replacing the full-image all_gather of image
    strips (which is O(H·W) per device — decisive at the grid-256 /
    1152x1024 shape, round-3 weakness 5). The map values are identical to
    :func:`pose_splatter_tpu.ops.ssim.ssim`'s VALID-conv map; callers
    psum the partials over the tile axis and divide.
    """
    from pose_splatter_tpu.ops.ssim import _filter2d, _gaussian_kernel

    B, T_l, P, ch = pred_t.shape
    rows_l = T_l // n_tx
    bh = rows_l * th
    Wp = n_tx * tw
    halo = kernel_size - 1

    def band(x):
        return (x.reshape(B, rows_l, n_tx, th, tw, ch)
                .transpose(0, 1, 3, 2, 4, 5).reshape(B, bh, Wp, ch))

    pb, tb = band(pred_t), band(tgt_t)
    n_dev = jax.lax.psum(1, tile_axis)
    idx = jax.lax.axis_index(tile_axis)
    # Halo rows come from the following device(s); when a band is shorter
    # than the halo (tiny test shapes) this takes a static number of hops.
    # Devices past the end receive zeros — their positions are masked.
    ext_p, ext_t = [pb], [tb]
    got = 0
    hop = 1
    while got < halo:
        take = min(bh, halo - got)
        if n_dev > hop:
            perm = [(d + hop, d) for d in range(n_dev - hop)]
            ext_p.append(jax.lax.ppermute(pb[:, :take], tile_axis, perm))
            ext_t.append(jax.lax.ppermute(tb[:, :take], tile_axis, perm))
        else:
            ext_p.append(jnp.zeros((B, take, Wp, ch), pb.dtype))
            ext_t.append(jnp.zeros((B, take, Wp, ch), tb.dtype))
        got += take
        hop += 1
    pe = jnp.concatenate(ext_p, axis=1)  # [B, bh+halo, Wp, ch]
    te = jnp.concatenate(ext_t, axis=1)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)
    mu_x = _filter2d(pe, kernel)
    mu_y = _filter2d(te, kernel)
    sigma_xx = _filter2d(pe * pe, kernel) - mu_x * mu_x
    sigma_yy = _filter2d(te * te, kernel) - mu_y * mu_y
    sigma_xy = _filter2d(pe * te, kernel) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_xx + sigma_yy + c2)
    smap = num / den  # [B, bh, Wp - halo, ch]

    # Window positions inside the REAL image: top row ≤ H-k, left ≤ W-k.
    g_rows = idx * bh + jnp.arange(bh)
    row_ok = g_rows <= H - kernel_size
    col_ok = jnp.arange(Wp - halo) <= W - kernel_size
    m = row_ok[None, :, None, None] & col_ok[None, None, :, None]
    total = jnp.sum(jnp.where(m, smap, 0.0))
    count = jnp.sum(m.astype(jnp.float32)) * B * ch
    return total, count


# ----------------------------------------------------------------------------
# (data, tile) 2D-mesh train step.
# ----------------------------------------------------------------------------

def make_tile_sharded_train_step(
    model,
    tx,
    img_lambda: float,
    ssim_lambda: float,
    mesh: Mesh,
    data_axis: str = "data",
    tile_axis: str = "tile",
    tile_shape: Tuple[int, int] = (32, 128),
    tile_capacity: int = 2048,
    chunk: int = 32,
    compositor: str = "xla",
):
    """Full train step on a 2D ``(data, tile)`` mesh.

    The frame batch shards over ``data`` (size must divide the batch);
    each frame's render + photometric loss shards its pixel tiles over
    ``tile``. carve/U-Net/heads are computed replicated along the tile
    axis (they are ~10% of the step at production shapes — sharding the
    volume is a possible further split, SURVEY.md §7). IoU and masked-L1
    are strip-decomposable and reduce with one ``psum(tile)``; SSIM uses
    one ``all_gather`` of the image strips. Gradients psum over both axes.
    """
    from pose_splatter_tpu.train.loop import TrainState

    n_tile = mesh.shape[tile_axis]
    th, tw = tile_shape
    H, W = model.H, model.W
    # Row-aligned shards: each device owns whole tile rows (a horizontal
    # image band) so SSIM can run strip-local with a halo exchange.
    origins, n_ty, n_tx, pad = _padded_origins(H, W, tile_shape, n_tile,
                                               row_aligned=True)
    T_real = n_ty * n_tx
    alpha_fn = _alpha_conic if model.gaussian_mode == "3d" else _alpha_ellipse

    def strip_render(variables, b, origins_l):
        """One frame's Gaussians composited on the local tile subset."""
        volume = model.carve(b["mask"], b["img"], b["p_3d"], b["angle"])
        volume = jnp.transpose(volume, (1, 2, 3, 0))[None]
        flat = model.net.apply(variables, volume, True,
                               method="process_volume",
                               mutable=["batch_stats"])[0]
        g = model.gaussians_from_volume(variables, flat)
        if model.gaussian_mode == "3d":
            g = model.apply_pose_transform_3d(g, b["angle"], b["p_3d"])
            view = b["view_idx"]
            K = model.Ks[view]
            viewmat = model.viewmats[view]
            proj = project_gaussians(
                g["means"], g["quats"], jnp.exp(g["log_scales"]), viewmat,
                K, W, H)
            ok = proj.valid & g["valid"]
            keys = jnp.where(ok, proj.depth, jnp.inf)
            order = jnp.argsort(keys)
            feats = (proj.mean2d[order], proj.conic[order],
                     jax.nn.sigmoid(g["logit_opacities"])[order])
            cols = g["colors"][order]
            center, radius, okk = proj.mean2d[order], proj.radius[order], ok[order]
            early = True
            offset = 0.5
        else:
            means2d = g["means2d"]
            if "anchor_means" in g:
                # View-anchored 2D extension (models/pose_splatter.py):
                # means2d is a pixel DELTA from the per-view projection of
                # the pose-transformed voxel anchor. Mirror model.forward's
                # anchor transform + model.render's projection here —
                # without this the deltas composite near pixel (0, 0).
                from pose_splatter_tpu.utils.geometry import (
                    project_points, yaw_rotation,
                )

                rot = yaw_rotation(b["angle"])
                anchors = g["anchor_means"] @ rot.T + b["p_3d"]
                view = b["view_idx"]
                pix = project_points(
                    anchors, model.Ks[view][None], model.viewmats[view][None],
                    clamp_z=True)[0]  # [N, 2]
                means2d = pix + means2d
            sc = jnp.exp(g["log_scales2d"])
            radius = model.sigma_cutoff * jnp.maximum(sc[:, 0], sc[:, 1])
            feats = (means2d, sc, g["rotation"],
                     jax.nn.sigmoid(g["logit_opacities"]))
            cols = g["colors"]
            center, okk = means2d, g["valid"]
            early = False
            offset = 0.0
        rgb_t, alpha_t = _composite_local(
            origins_l, feats, cols, okk, center, radius, alpha_fn,
            tile_shape, tile_capacity, chunk, early, offset, compositor)
        bg = model.background_color
        rgb_t = rgb_t + (1.0 - alpha_t[..., None]) * bg.reshape(1, 1, 3)
        return rgb_t, alpha_t  # [T_l, th*tw, 3], [T_l, th*tw]

    def gather_strips(x_t, B):
        """[B, T/n, ...] local strips → full image via all_gather(tile)."""
        full = jax.lax.all_gather(x_t, tile_axis, axis=1, tiled=True)
        full = full[:, :T_real]
        img_shape = (B, n_ty, n_tx, th, tw) + x_t.shape[3:]
        perm = (0, 1, 3, 2, 4) + tuple(range(5, len(img_shape)))
        return (full.reshape(img_shape).transpose(perm)
                .reshape((B, n_ty * th, n_tx * tw) + x_t.shape[3:])
                [:, :H, :W])

    def target_strips(img2d, origins_l):
        """Slice target images into this device's tile strips."""
        padded = jnp.pad(
            img2d,
            ((0, n_ty * th - H), (0, n_tx * tw - W)) +
            ((0, 0),) * (img2d.ndim - 2),
            constant_values=0.0)

        def one(o):
            return jax.lax.dynamic_slice(
                padded, (o[0], o[1]) + (0,) * (img2d.ndim - 2),
                (th, tw) + img2d.shape[2:])

        # Off-screen pad tiles read zeros (clamped slice on padded array
        # could alias real pixels; mask them out instead).
        strips = jax.vmap(one)(jnp.minimum(origins_l,
                                           jnp.array([n_ty * th - th,
                                                      n_tx * tw - tw])))
        real = (origins_l[:, 0] < n_ty * th) & (origins_l[:, 1] < n_tx * tw)
        strips = strips * real.reshape(-1, *([1] * (strips.ndim - 1)))
        return strips.reshape((origins_l.shape[0], th * tw) + img2d.shape[2:])

    def local_loss(params, batch_stats, batch_l, origins_l):
        variables = {"params": params, "batch_stats": batch_stats}

        def one_frame(b):
            rgb_t, alpha_t = strip_render(variables, b, origins_l)
            tgt_img = target_strips(b["img"][b["obs_idx"]], origins_l)
            tgt_mask = target_strips(b["mask"][b["obs_idx"]], origins_l)
            # Strip-local partial sums → full-image losses via psum(tile).
            inter = jnp.sum(alpha_t * tgt_mask)
            union = jnp.sum(alpha_t + tgt_mask - alpha_t * tgt_mask)
            l1_num = jnp.sum(jnp.abs(tgt_img - rgb_t))
            m_sum = jnp.sum(tgt_mask)
            return rgb_t, tgt_img, inter, union, l1_num, m_sum

        rgb_t, tgt_t, inter, union, l1n, msum = jax.vmap(one_frame)(batch_l)
        inter = jax.lax.psum(inter, tile_axis)
        union = jax.lax.psum(union, tile_axis)
        l1n = jax.lax.psum(l1n, tile_axis)
        msum = jax.lax.psum(msum, tile_axis)
        iou = 1.0 - (inter + 1e-6) / (union + 1e-6)
        l1 = l1n / jnp.maximum(msum, 1.0)
        loss = iou.mean() + img_lambda * l1.mean()
        if ssim_lambda:
            # Strip-halo windowed SSIM: identical map values to ssim_fn,
            # O(band) memory instead of the full-image all_gather.
            s_sum, s_cnt = _ssim_band_partial(
                rgb_t, tgt_t, tile_axis, n_tx, th, tw, H, W)
            s_sum = jax.lax.psum(s_sum, tile_axis)
            s_cnt = jax.lax.psum(s_cnt, tile_axis)
            loss = loss + ssim_lambda * (1.0 - s_sum / s_cnt)
        # Mean over the (global) frame batch.
        loss = jax.lax.pmean(loss, data_axis)
        return loss

    def step(state, batch, origins_arr):
        def sharded_body(params, batch_stats, opt_state, batch_l, origins_l):
            loss, grads = jax.value_and_grad(local_loss)(
                params, batch_stats, batch_l, origins_l)
            grads = jax.lax.pmean(
                jax.lax.pmean(grads, data_axis), tile_axis)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            return new_params, new_opt, loss

        body = shard_map(
            sharded_body,
            mesh=mesh,
            in_specs=(P(), P(), P(),
                      jax.tree.map(lambda _: P(data_axis), batch),
                      P(tile_axis)),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )
        new_params, new_opt, loss = body(
            state.params, state.batch_stats, state.opt_state, batch,
            origins_arr)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=state.batch_stats,
                          opt_state=new_opt), loss

    jitted = jax.jit(step)

    def wrapped(state, batch):
        return jitted(state, batch, origins)

    return wrapped
