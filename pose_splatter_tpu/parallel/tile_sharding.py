"""Tile-sharded rendering: one frame's pixel tiles split over devices.

The second mesh axis from SURVEY.md §5.8: Gaussians are small (≤16k × a few
floats — replicate them), pixels are big. Under ``shard_map`` each device
bins and composites its own subset of tiles (screen features replicated,
tile origins sharded), and the image strips are reassembled by the
``out_specs`` all-gather riding ICI. Combined with the ``data`` axis this
gives the 2D mesh ``(data, tile)``: frame/camera batches over hosts, pixel
tiles over chips — the pod-scale layout for the grid-256 high-res config.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
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
    _tile_grid,
    bin_gaussians,
    composite_pixels,
)


def rasterize_tile_sharded(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    viewmat: jnp.ndarray,  # [4,4] single camera
    K: jnp.ndarray,  # [3,3]
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "tile",
    valid: Optional[jnp.ndarray] = None,
    backgrounds: Optional[jnp.ndarray] = None,
    tile_shape: Tuple[int, int] = (32, 128),
    tile_capacity: int = 1024,
    chunk: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3D rasterization with tiles sharded over ``mesh[axis]``.

    The tile-row count must be divisible by the axis size (pad the image or
    pick a tile shape accordingly). Returns rgb [H,W,3], alpha [H,W].
    """
    N = means.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)

    proj = project_gaussians(means, quats, scales, viewmat, K, width, height)
    ok = proj.valid & valid
    keys = jnp.where(ok, proj.depth, jnp.inf)
    order = jnp.argsort(keys)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    opac = opacities[order]
    cols = colors[order]
    ok_s = ok[order]
    rad = proj.radius[order]

    th, tw = tile_shape
    origins, n_ty, n_tx = _tile_grid(height, width, tile_shape)
    n_tiles = origins.shape[0]
    n_dev = mesh.shape[axis]
    assert n_tiles % n_dev == 0, (
        f"{n_tiles} tiles not divisible by {n_dev} devices on axis '{axis}'"
    )

    pix_dy = jnp.arange(th, dtype=jnp.float32) + 0.5
    pix_dx = jnp.arange(tw, dtype=jnp.float32) + 0.5
    yy, xx = jnp.meshgrid(pix_dy, pix_dx, indexing="ij")

    def local_tiles(origins_l, mean2d, conic, opac, cols, ok_s, rad):
        """Composite this device's tile subset (everything else replicated)."""
        binning = bin_gaussians(mean2d, rad, ok_s, origins_l, tile_shape,
                                tile_capacity)
        feats_t = (
            mean2d[binning.indices],
            conic[binning.indices],
            opac[binning.indices],
        )
        cols_t = cols[binning.indices]
        tys = origins_l[:, 0:1].astype(jnp.float32) + yy.reshape(1, -1)
        txs = origins_l[:, 1:2].astype(jnp.float32) + xx.reshape(1, -1)

        def per_tile(f, c, m, xs_, ys_):
            return composite_pixels(xs_, ys_, f, c, m, _alpha_conic,
                                    chunk=chunk, early_stop=True)

        rgb_t, alpha_t = jax.vmap(per_tile)(
            feats_t, cols_t, binning.valid, txs, tys
        )
        return rgb_t, alpha_t  # [T/n, th*tw, 3], [T/n, th*tw]

    sharded = shard_map(
        local_tiles,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_rep=False,
    )
    rgb_t, alpha_t = sharded(origins, mean2d, conic, opac, cols, ok_s, rad)

    rgb = (
        rgb_t.reshape(n_ty, n_tx, th, tw, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n_ty * th, n_tx * tw, 3)[:height, :width]
    )
    alpha = (
        alpha_t.reshape(n_ty, n_tx, th, tw)
        .transpose(0, 2, 1, 3)
        .reshape(n_ty * th, n_tx * tw)[:height, :width]
    )
    if backgrounds is not None:
        rgb = rgb + (1.0 - alpha[..., None]) * backgrounds.reshape(1, 1, 3)
    return rgb, alpha
