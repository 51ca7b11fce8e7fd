"""PoseSplatter: feed-forward Gaussian splatting from multi-view silhouettes.

End-to-end TPU pipeline (all static shapes, one ``jit``):
    carve → residual 3D U-Nets → static top-k Gaussian selection →
    per-voxel MLP head → pose transform → differentiable rasterization.

Behavior parity with the reference model (``/root/reference/src/model.py``):

- Trainable global log-scale offset init −5.5 (``model.py:86``).
- Carver over observed views only (``model.py:94-102``).
- Per-Gaussian MLP Linear(out_ch→128)→ReLU→Linear(128→P) (``model.py:104-111``).
- Residual U-Net stack ``v = v + unet(v)`` then a final U-Net, flattened to
  ``[c, n³]`` (``model.py:322-336``); ablation path pads zeros (``:323-329``).
- Gaussian extraction (``model.py:177-256``): the adaptive mask-threshold
  loop becomes two scalar ``lax.while_loop``s over the threshold followed by
  a static ``top_k`` — identical count semantics; when the occupied count
  exceeds ``max_n`` the reference randomly subsamples
  (``model.py:199-204``) while we keep the top-``max_n`` by occupancy logit
  (deterministic; a documented deviation).
- Opacities are prob-derived, not MLP-driven (``model.py:220-222``).
- means = voxel center + 2·voxel_size·tanh(Δ) (``model.py:223``);
  colors = clip(sigmoid(c), 0, 0.99) (``model.py:218``).
- Pose transform (``model.py:258-298``): yaw+translate means; quats rotated
  by direct quaternion composition (equal rotation to the reference's
  float64 eigh round-trip, ``model.py:368-421``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pose_splatter_tpu.ops.carving import carve_volume
from pose_splatter_tpu.ops.rasterize import rasterize, rasterize_2d
from pose_splatter_tpu.models.unet3d import Unet3D
from pose_splatter_tpu.utils.geometry import (
    create_3d_grid,
    rotate_quats_by_yaw,
    yaw_rotation,
)


class GaussianSelection(NamedTuple):
    indices: jnp.ndarray  # [max_n] voxel indices (by descending occupancy)
    valid: jnp.ndarray  # [max_n] bool
    probs: jnp.ndarray  # [max_n] selection probabilities at the final mt
    mask_threshold: jnp.ndarray  # [] final threshold


def select_gaussians(
    vol0: jnp.ndarray,
    min_n: int,
    max_n: int,
    prob_threshold: float,
    mask_threshold: float,
    mask_threshold_delta: float,
) -> GaussianSelection:
    """Static-shape replacement for the adaptive threshold loop
    (``model.py:184-204``). ``vol0``: [N] occupancy logits."""
    logit_pt = math.log(prob_threshold / (1.0 - prob_threshold))

    def count(mt):
        return jnp.sum(vol0 > mt + logit_pt)

    mt = jnp.float32(mask_threshold)
    mt = jax.lax.while_loop(
        lambda m: count(m) > max_n, lambda m: m + mask_threshold_delta, mt
    )
    mt = jax.lax.while_loop(
        lambda m: count(m) < min_n, lambda m: m - mask_threshold_delta, mt
    )
    vals, idx = jax.lax.top_k(vol0, max_n)
    valid = vals > (mt + logit_pt)
    probs = jax.nn.sigmoid(vals - mt)
    return GaussianSelection(indices=idx, valid=valid, probs=probs, mask_threshold=mt)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def take_rows_unique(x, idx, n):
    """``x[idx]`` for UNIQUE row indices with a scatter-SET adjoint.

    XLA autodiff of a gather emits a scatter-ADD, which serializes on TPU;
    top-k indices are unique, so the adjoint is a row scatter-set
    (``unique_indices`` + dropped out-of-range rows) — ~constant-time at
    the bench shape. ``n`` is the static row count of ``x``.
    """
    del n
    return jnp.take(x, idx, axis=0)


def _take_rows_unique_fwd(x, idx, n):
    return jnp.take(x, idx, axis=0), idx


def _take_rows_unique_bwd(n, idx, g):
    dx = jnp.zeros((n, g.shape[1]), g.dtype).at[idx].set(
        g, mode="drop", unique_indices=True)
    return dx, np.zeros(idx.shape, dtype=jax.dtypes.float0)


take_rows_unique.defvjp(_take_rows_unique_fwd, _take_rows_unique_bwd)


class PoseSplatterNet(nn.Module):
    """Trainable parameters: U-Net stack, Gaussian MLP head, scale offset.

    ``remat`` wraps each U-Net in ``nn.remat`` (store only the block
    input, recompute activations in the backward): the grid-256 /
    1152x1024 config's step otherwise wants ~80 GB of HBM for U-Net
    backward activations + XLA's auto-remat copies (docs/PERF_r05.md §6)
    against the chip's 16 GB. Costs ~one extra U-Net forward per U-Net
    per step; off by default.
    """

    in_channels: int = 4
    out_channels: int = 8
    base_filters: int = 8
    num_unets: int = 3
    input_size: Tuple[int, int, int] = (64, 64, 64)
    num_gaussian_params: int = 14
    ablation: bool = False
    remat: bool = False

    def setup(self):
        if not self.ablation:
            cls = (nn.remat(Unet3D, static_argnums=(2,))
                   if self.remat else Unet3D)
            self.unets = [
                cls(
                    in_channels=self.in_channels,
                    out_channels=self.in_channels,
                    base_filters=self.base_filters,
                    input_size=self.input_size,
                    name=f"unet_{i}",
                )
                for i in range(self.num_unets - 1)
            ]
            self.final_unet = cls(
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                base_filters=self.base_filters,
                input_size=self.input_size,
                name="final_unet",
            )
        self.head1 = nn.Dense(128, name="head1")
        self.head2 = nn.Dense(self.num_gaussian_params, name="head2")
        self.scale = self.param("scale", lambda rng: -5.5 * jnp.ones((1,)))

    def process_volume(self, volume: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """volume [1, n1, n2, n3, in_ch] (NDHWC) → [out_ch, n1*n2*n3]."""
        if self.ablation:
            pad_len = self.out_channels - self.in_channels
            v = volume[0]
            pad = jnp.zeros(v.shape[:-1] + (pad_len,), v.dtype)
            v = jnp.concatenate([v, pad], axis=-1)
            return v.reshape(-1, self.out_channels).T
        v = volume
        for unet in self.unets:
            out, _ = unet(v, train)
            v = v + out
        v, _ = self.final_unet(v, train)
        return v[0].reshape(-1, self.out_channels).T  # [c, N]

    def gaussian_head(self, feats: jnp.ndarray) -> jnp.ndarray:
        """feats [n, out_ch] → [n, P]."""
        return self.head2(nn.relu(self.head1(feats)))

    def __call__(self, volume: jnp.ndarray, train: bool = True):
        flat = self.process_volume(volume, train)
        params = self.gaussian_head(flat[:, :8].T)
        return flat, params


def init_means2d_center(params, W: int, H: int, sigma_px: float = 2.0,
                        anchored: bool = False):
    """2D-mode init aid: bias the Gaussian head so means2d start at the
    image center instead of pixel (0, 0), and set the shared log-scale to
    a visible pixel sigma.

    The reference's 2D head emits raw pixel coordinates from a default
    near-zero-bias MLP (``src/model.py:236-254``) and keeps the 3D world-
    unit scale init (−5.5 → σ≈0.004 PIXELS — sub-pixel dots), relying on
    its long training schedule (~1e5 steps) to migrate/grow Gaussians;
    both choices put the optimizer in a near-zero-gradient corner.
    Centering the start and initializing σ≈``sigma_px`` removes that
    transient without changing the learned optimum. Framework extension,
    documented deviation (docs/DESIGN.md §5)."""
    out = dict(params)
    if not anchored:
        head = dict(params["head2"])
        b = head["bias"].at[0].set(W / 2.0).at[1].set(H / 2.0)
        head["bias"] = b
        out["head2"] = head
    # View-anchored mode starts at the voxel projection (delta ~ 0 from the
    # default near-zero MLP init); only the sigma init applies.
    out["scale"] = jnp.full_like(params["scale"], math.log(sigma_px))
    return out


class PoseSplatter:
    """Orchestrates constants (cameras, grid) + the Flax net + render.

    Not a Flax module itself: camera tensors and the voxel grid are embedded
    as jit constants via closures, which lets XLA pre-fold them.
    """

    def __init__(
        self,
        intrinsics: np.ndarray,
        extrinsics: np.ndarray,
        W: int,
        H: int,
        in_channels: int = 4,
        out_channels: int = 8,
        base_filters: int = 8,
        ell: float = 0.18,
        grid_size: int = 64,
        min_n: int = 1024,
        max_n: int = 16000,
        num_unets: int = 3,
        color_clip: Tuple[float, float] = (0.0, 0.99),
        prob_threshold: float = 0.25,
        mask_threshold: float = 0.25,
        mask_threshold_delta: float = 0.05,
        volume_idx: Optional[Sequence[Sequence[int]]] = None,
        ablation: bool = False,
        volume_fill_color: float = 0.45,
        holdout_views: Sequence[int] = (),
        adaptive_camera: bool = False,
        gaussian_mode: str = "3d",
        gaussian_config: Optional[Dict[str, Any]] = None,
        background_color: Sequence[float] = (1.0, 1.0, 1.0),
        render_mode: str = "tiled",
        tile_shape: Optional[Tuple[int, int]] = None,
        tile_capacity: Optional[int] = None,
        carve_visibility_cap: Optional[int] = None,
        remat_unets: bool = False,
    ):
        assert volume_idx is not None, "volume_idx is required"
        assert gaussian_mode in ("2d", "3d")
        self.W, self.H = W, H
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.min_n = min_n
        self.max_n = max_n
        self.color_clip = color_clip
        self.prob_threshold = prob_threshold
        self.mask_threshold = mask_threshold
        self.mask_threshold_delta = mask_threshold_delta
        self.ablation = ablation
        self.volume_fill_color = float(volume_fill_color)
        self.holdout_views = list(holdout_views)
        self.adaptive_camera = adaptive_camera
        self.gaussian_mode = gaussian_mode
        self.gaussian_config = dict(gaussian_config or {})
        self.render_mode = render_mode
        self.tile_shape = tile_shape
        self.tile_capacity = tile_capacity
        # Static cap for the carve's visibility compaction (ops/carving.py
        # carve_volume docstring); None = exact full-N path.
        self.carve_visibility_cap = carve_visibility_cap

        C = len(intrinsics)
        self.num_cameras = C
        self.observed_views = [i for i in range(C) if i not in self.holdout_views]

        self.Ks = jnp.asarray(intrinsics, jnp.float32)  # [C,3,3]
        self.viewmats = jnp.asarray(extrinsics, jnp.float32)  # [C,4,4]
        obs = np.asarray(self.observed_views)
        self.Ks_obs = self.Ks[obs]
        self.viewmats_obs = self.viewmats[obs]
        self.background_color = jnp.asarray(background_color, jnp.float32)

        self.grid = jnp.asarray(
            create_3d_grid(ell, grid_size, volume_idx=volume_idx)
        )  # [n1,n2,n3,3]
        self.input_size = tuple(int(i2 - i1) for (i1, i2) in volume_idx)
        self.voxel_size = ell / grid_size
        self.num_gaussian_params = 14 if gaussian_mode == "3d" else 9
        self.sigma_cutoff = float(self.gaussian_config.get("sigma_cutoff", 3.0))
        # Max tiles one Gaussian may span in the pallas binning (overflow
        # is counted, never silent). The library default (rasterize_pallas.
        # DEFAULT_EXPAND=8) is sized for benchmark-scale ~2-3 px sigmas;
        # TRAINED models grow larger Gaussians mid-optimization, so the
        # model's production default is 16 (covers a 3σ radius ~28 px at
        # the default (8,128) tiles; the r4 north-star run peaked well
        # under that). Override via gaussian_config["tile_expand"].
        te = self.gaussian_config.get("tile_expand")
        self.tile_expand = int(te) if te is not None else 16
        # Framework extension (docs/DESIGN.md §5): the reference's 2D mode
        # emits raw pixel coordinates and its renderer ignores the cameras
        # entirely (``gaussian_renderer.py:227-228``), which makes
        # multi-view training ill-posed — the same volume must hit
        # view-dependent targets with a view-independent render.
        # ``gaussian_config["view_anchored"]`` anchors each 2D Gaussian at
        # the projection of its (pose-transformed) voxel center into the
        # requested camera, with the MLP's means output acting as a pixel
        # delta — exactly the reference's own 3D-head trick
        # (``model.py:223``) applied in screen space. Default off
        # (reference-faithful).
        self.view_anchored_2d = (
            bool(self.gaussian_config.get("view_anchored", False))
            and gaussian_mode == "2d"
        )

        self.net = PoseSplatterNet(
            in_channels=in_channels,
            out_channels=out_channels,
            base_filters=base_filters,
            num_unets=num_unets,
            input_size=self.input_size,
            num_gaussian_params=self.num_gaussian_params,
            ablation=ablation,
            remat=remat_unets,
        )

    # ------------------------------------------------------------------
    def make_adaptive_fn(self):
        """Host hook for adaptive_camera: per-frame principal-point
        re-centering over the observed views,
        ``adaptive_fn(mask [C',H,W]) -> (temp_K [C',3,3], seed [3])``.
        The reference recomputes this inside EVERY forward — training,
        evaluation, and plotting alike (``src/shape_carver.py:328-347``);
        callers of :meth:`forward` must apply it whenever
        ``self.adaptive_camera`` to avoid a train/inference mismatch."""
        from pose_splatter_tpu.utils.cameras import (
            adjust_principal_points_to_seed,
        )

        Ks_obs = np.asarray(self.Ks_obs)
        Es_obs = np.asarray(self.viewmats_obs)

        def adaptive_fn(mask):
            return adjust_principal_points_to_seed(
                np.asarray(mask), Ks_obs, Es_obs)

        return adaptive_fn

    # ------------------------------------------------------------------
    def init(self, rng) -> Dict[str, Any]:
        dummy = jnp.zeros((1, *self.input_size, self.in_channels))
        return self.net.init(rng, dummy, train=False)

    # ------------------------------------------------------------------
    def carve(self, mask, img, p_3d, angle, K_mask=None):
        """Shape-carve one frame. mask [C',H,W]; img [C',H,W,3] (observed
        views only). ``K_mask`` overrides the mask-projection intrinsics
        (adaptive-camera ``temp_K``, computed host-side)."""
        return carve_volume(
            mask,
            img,
            p_3d,
            angle,
            self.grid,
            K_mask,
            self.Ks_obs,
            self.viewmats_obs,
            volume_fill_color=self.volume_fill_color,
            visibility_cap=self.carve_visibility_cap,
        )

    # ------------------------------------------------------------------
    def gaussians_from_volume(self, variables, vol_flat, train=False):
        """vol_flat [out_ch, N] → dict of world/pixel-space Gaussian params.

        Mirrors ``get_gaussian_params_from_volume_unified`` (``model.py:177-256``).
        """
        sel = select_gaussians(
            vol_flat[0],
            self.min_n,
            self.max_n,
            self.prob_threshold,
            self.mask_threshold,
            self.mask_threshold_delta,
        )
        # Row-gather in [N, ch] layout with a unique-index scatter-set VJP
        # (the autodiff scatter-add of a [ch, N] column gather costs ~100 ms
        # at the north-star shape; docs/PERF_r04.md). NOTE: only top_k
        # indices (unique by construction) are valid here — the scatter-set
        # adjoint silently drops contributions for duplicate rows.
        volT = vol_flat.T  # [N, out_ch]
        feats = take_rows_unique(volT, sel.indices, volT.shape[0])
        net_out = self.net.apply(variables, feats, method="gaussian_head")

        pt = self.prob_threshold
        logit_opac = jax.scipy.special.logit(
            jnp.clip((1.0 / (1.0 - pt)) * (sel.probs - pt), 1e-6, 1.0 - 1e-6)
        )  # [max_n]
        scale_param = variables["params"]["scale"][0]

        if self.gaussian_mode == "3d":
            quats, scales, _opac, colors, delta_means = jnp.split(
                net_out, np.cumsum([4, 3, 1, 3]), axis=1
            )
            colors = jnp.clip(
                jax.nn.sigmoid(colors), self.color_clip[0], self.color_clip[1]
            )
            log_scales = scales + scale_param
            base = self.grid.reshape(-1, 3)[sel.indices]
            means = base + 2.0 * self.voxel_size * jnp.tanh(delta_means)
            return dict(
                means=means,
                log_scales=log_scales,
                quats=quats,
                colors=colors,
                logit_opacities=logit_opac,
                valid=sel.valid,
            )
        else:
            means2d, scales2d, rotation, colors, _opac = jnp.split(
                net_out, np.cumsum([2, 2, 1, 3]), axis=1
            )
            colors = jnp.clip(
                jax.nn.sigmoid(colors), self.color_clip[0], self.color_clip[1]
            )
            log_scales2d = scales2d + scale_param
            out = dict(
                means2d=means2d,
                log_scales2d=log_scales2d,
                rotation=rotation[:, 0],
                colors=colors,
                logit_opacities=logit_opac,
                valid=sel.valid,
            )
            if self.view_anchored_2d:
                # means2d becomes a pixel DELTA from the per-view projection
                # of the voxel center (see __init__ notes).
                out["anchor_means"] = jnp.take(
                    self.grid.reshape(-1, 3), sel.indices, axis=0)
            return out

    # ------------------------------------------------------------------
    def apply_pose_transform_3d(self, g, angle, p_3d):
        """Yaw-rotate + translate world-space Gaussians (``model.py:258-298``)."""
        rot = yaw_rotation(angle)
        g = dict(g)
        g["means"] = g["means"] @ rot.T + p_3d
        g["quats"] = rotate_quats_by_yaw(g["quats"], angle)
        return g

    # ------------------------------------------------------------------
    def render(self, g, view_idx, K_override=None, return_overflow=False):
        """Render Gaussians to the cameras in ``view_idx`` ([B] int array).

        Returns rgb [B,H,W,3], alpha [B,H,W] (+ overflow [] int32 when
        ``return_overflow`` — the count of Gaussian×tile instances dropped
        by finite binning capacity; the no-silent-truncation contract).
        """
        view_idx = jnp.atleast_1d(jnp.asarray(view_idx))
        if self.gaussian_mode == "3d":
            Ks = self.Ks if K_override is None else K_override
            Ks = jnp.take(Ks, view_idx, axis=0)
            viewmats = jnp.take(self.viewmats, view_idx, axis=0)
            out = rasterize(
                g["means"],
                g["quats"],
                jnp.exp(g["log_scales"]),
                jax.nn.sigmoid(g["logit_opacities"]),
                g["colors"],
                viewmats,
                Ks,
                self.W,
                self.H,
                valid=g["valid"],
                backgrounds=self.background_color,
                mode=self.render_mode,
                tile_shape=self.tile_shape,
                tile_capacity=self.tile_capacity,
                tile_expand=self.tile_expand,
                return_overflow=return_overflow,
            )
            return out
        else:
            B = view_idx.shape[0]

            def _r2d(means2d):
                return rasterize_2d(
                    means2d,
                    jnp.exp(g["log_scales2d"]),
                    g["rotation"],
                    jax.nn.sigmoid(g["logit_opacities"]),
                    g["colors"],
                    self.W,
                    self.H,
                    valid=g["valid"],
                    background=self.background_color,
                    sigma_cutoff=self.sigma_cutoff,
                    mode=self.render_mode,
                    tile_shape=self.tile_shape,
                    tile_capacity=self.tile_capacity,
                    tile_expand=self.tile_expand,
                    return_overflow=return_overflow,
                )

            if "anchor_means" in g:
                # View-anchored extension: per-view projection + MLP delta.
                from pose_splatter_tpu.utils.geometry import project_points

                Ks = self.Ks if K_override is None else K_override
                Ks_v = jnp.take(Ks, view_idx, axis=0)  # [B,3,3]
                Es_v = jnp.take(self.viewmats, view_idx, axis=0)
                pix = project_points(
                    g["anchor_means"], Ks_v, Es_v, clamp_z=True)  # [B,N,2]
                # Static unroll over views (B is 1 in training): vmap of the
                # pallas compositor under the outer frame-batch vmap hits a
                # remote-compile hang this unroll avoids (see
                # rasterize_pallas._warm_kernels).
                outs = [_r2d(pix[b] + g["means2d"]) for b in range(B)]
                rgb = jnp.stack([o[0] for o in outs])
                alpha = jnp.stack([o[1] for o in outs])
                if return_overflow:
                    return rgb, alpha, sum(o[2] for o in outs)
                return rgb, alpha
            out = _r2d(g["means2d"])
            rgb, alpha = out[0], out[1]
            rgb = jnp.broadcast_to(rgb[None], (B, *rgb.shape))
            alpha = jnp.broadcast_to(alpha[None], (B, *alpha.shape))
            if return_overflow:
                return rgb, alpha, out[2]
            return rgb, alpha

    # ------------------------------------------------------------------
    def forward(
        self,
        variables,
        mask,
        img,
        p_3d,
        angle,
        view_idx,
        train: bool = True,
        K_mask=None,
        carve_center=None,
        mutable=None,
        return_overflow: bool = False,
    ):
        """Full forward pass for one frame (``model.py:134-174``).

        Args:
            variables: {'params': ..., 'batch_stats': ...}.
            mask [C',H,W]; img [C',H,W,3] (observed views only, channel-last).
            p_3d [3]; angle scalar; view_idx int or [B] ints.
            K_mask: adaptive-camera temp_K override (host-precomputed).
            carve_center: adaptive-camera triangulated seed [3] — repositions
                ONLY the carving grid (reference replaces ``center`` inside
                the carver, ``src/shape_carver.py:328-337``) while the pose
                transform keeps the dataset ``p_3d`` (``model.py:154``).
            mutable: e.g. ['batch_stats'] during training.

        Returns (rgb [B,H,W,3], alpha [B,H,W], new_mutable_vars_or_None).
        """
        center = p_3d if carve_center is None else carve_center
        volume = self.carve(mask, img, center, angle, K_mask=K_mask)  # [4,n1,n2,n3]
        volume = jnp.transpose(volume, (1, 2, 3, 0))[None]  # [1,n1,n2,n3,4]

        if mutable:
            vol_flat, new_vars = self.net.apply(
                variables, volume, train, method="process_volume", mutable=mutable
            )
        else:
            vol_flat = self.net.apply(
                variables, volume, train, method="process_volume"
            )
            new_vars = None

        g = self.gaussians_from_volume(variables, vol_flat, train=train)
        if self.gaussian_mode == "3d":
            g = self.apply_pose_transform_3d(g, angle, p_3d)
        elif "anchor_means" in g:
            # Anchored 2D: pose-transform the anchor positions only (the
            # screen-space delta/scales/rotation stay as-is).
            rot = yaw_rotation(angle)
            g = dict(g)
            g["anchor_means"] = g["anchor_means"] @ rot.T + p_3d

        # Adaptive camera: the per-frame temp_K (observed views) also drives
        # rendering (reference model.py:157-160). Scatter it into the full
        # camera set so holdout views keep their original intrinsics.
        K_override = None
        if K_mask is not None:
            obs = jnp.asarray(np.asarray(self.observed_views))
            K_override = self.Ks.at[obs].set(K_mask)

        if return_overflow:
            rgb, alpha, overflow = self.render(
                g, view_idx, K_override=K_override, return_overflow=True)
            return rgb, alpha, new_vars, overflow
        rgb, alpha = self.render(g, view_idx, K_override=K_override)
        return rgb, alpha, new_vars

    # ------------------------------------------------------------------
    def splat(
        self,
        means,
        quats,
        scales,
        opacities,
        colors,
        viewmats,
        Ks,
        width,
        height,
        valid=None,
        radius_clip=2.0,
    ):
        """Direct batched-camera render (``model.py:339-365``): used by the
        evaluation, novel-view, and visual-feature pipelines."""
        rgb, alpha = rasterize(
            means,
            quats,
            scales,
            opacities,
            colors,
            viewmats,
            Ks,
            width,
            height,
            valid=valid,
            backgrounds=None,
            near_plane=0.01,
            far_plane=1e10,
            radius_clip=radius_clip,
            mode=self.render_mode,
            tile_shape=self.tile_shape,
            tile_capacity=self.tile_capacity,
            tile_expand=self.tile_expand,
        )
        rgb = rgb + (1.0 - alpha[..., None]) * self.background_color
        return jnp.clip(rgb, 0.0, 1.0), alpha
