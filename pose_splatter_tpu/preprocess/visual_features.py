"""Visual-pose features: spherical rendering → ResNet18 → SH power (stage 1).

Parity with ``/root/reference/scripts/preprocessing/calculate_visual_features.py``:

- spherical camera rig: Gauss-Legendre polar nodes (N_θ = L+1) × uniform
  azimuth (N_φ = 2(L+1)), look-at extrinsics, fov 7.5°, 224² (``:29-99,164-189``);
- SH projection matrix A [(L+1)², N_θ·N_φ] from conjugate spherical
  harmonics with quadrature weights (``:102-150``);
- per frame: carve → U-Nets → Gaussians, center the means, apply a random
  yaw, splat to the rig, ResNet18 features, ``|A · f|`` →
  rotation-equivariant-then-invariant [(L+1)², 512] float16 (``:253-304``).

TPU-native notes: the rig render is a single batched-camera rasterize (32
cameras in one call — the ``splat`` path); ResNet runs on-device in Flax.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical


def _sph_harm(m, ell, phi, theta):
    """Y_l^m(θ, φ) with θ polar, φ azimuth, across scipy versions."""
    try:
        from scipy.special import sph_harm_y

        return sph_harm_y(ell, m, theta, phi)
    except ImportError:  # older scipy
        from scipy.special import sph_harm

        return sph_harm(m, ell, phi, theta)


def spherical_rig(
    L: int = 3, radius: float = 1.0, fov_deg: float = 7.5,
    width: int = 224, height: int = 224,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Build the rig. Returns (Ks [V,3,3], viewmats [V,4,4], thetas, phis,
    leggauss weights) with V = (L+1)·2(L+1)."""
    n_theta = L + 1
    n_phi = 2 * n_theta
    x, weights = np.polynomial.legendre.leggauss(n_theta)
    thetas = np.arccos(x)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)

    f = 0.5 * width / np.tan(fov_deg / 360 * np.pi)
    K = np.array([[f, 0.0, width / 2], [0, f, height / 2], [0, 0, 1]])
    Ks = np.tile(K[None], (n_theta * n_phi, 1, 1)).astype(np.float32)

    viewmats = np.zeros((n_theta, n_phi, 4, 4), np.float32)
    for i, th in enumerate(thetas):
        for j, ph in enumerate(phis):
            viewmats[i, j] = camera_extrinsic_spherical(radius, th, ph)
    return Ks, viewmats.reshape(-1, 4, 4), thetas, phis, weights


def build_A(L: int, w: np.ndarray, thetas: np.ndarray, phis: np.ndarray
            ) -> np.ndarray:
    """SH projection matrix [(L+1)², N_θ·N_φ] (complex64), row (ell, m),
    column (k, j), entries  w_k·Δφ·conj(Y_ℓ^m(θ_k, φ_j))."""
    n_theta, n_phi = len(thetas), len(phis)
    dphi = 2.0 * np.pi / n_phi
    A = np.zeros(((L + 1) ** 2, n_theta * n_phi), dtype=complex)
    row = 0
    for ell in range(L + 1):
        for m in range(-ell, ell + 1):
            for k in range(n_theta):
                weight = w[k] * dphi
                for j in range(n_phi):
                    A[row, k * n_phi + j] = weight * np.conjugate(
                        _sph_harm(m, ell, phis[j], thetas[k])
                    )
            row += 1
    return A.astype(np.complex64)


def sh_invariant_features(features: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """[V, 512] per-view features → [(L+1)², 512] rotation-invariant moduli."""
    proj = jnp.einsum("ij,jx->ix", A, features.astype(jnp.complex64))
    return jnp.abs(proj)


def calculate_visual_features(
    config,
    model,
    variables,
    dataset,
    resnet_weights: Optional[str] = None,
    L: int = 3,
    dry_run: bool = False,
    seed: int = 0,
    progress: bool = True,
) -> np.ndarray:
    """Stage-1 driver: per frame render the spherical rig and extract SH-
    invariant ResNet features. Returns [T, (L+1)², 512] float16 and writes
    ``config.feature_fn``."""
    from pose_splatter_tpu.models.resnet import create_feature_extractor
    from pose_splatter_tpu.utils.geometry import yaw_rotation

    W = H = 224
    Ks, viewmats, thetas, phis, weights = spherical_rig(L)
    A = jnp.asarray(build_A(L, weights, thetas, phis))
    Ks_j = jnp.asarray(Ks)
    views_j = jnp.asarray(viewmats)

    extract, _ = create_feature_extractor(resnet_weights)

    @jax.jit
    def frame_features(variables, mask, img, p_3d, angle, theta):
        volume = model.carve(mask, img, p_3d, angle)
        volume = jnp.transpose(volume, (1, 2, 3, 0))[None]
        vol_flat = model.net.apply(variables, volume, False,
                                   method="process_volume")
        g = model.gaussians_from_volume(variables, vol_flat, train=False)
        means = g["means"] - jnp.mean(g["means"], axis=0, keepdims=True)
        means = means @ yaw_rotation(theta).T
        rgb, _ = model.splat(
            means,
            g["quats"],
            jnp.exp(g["log_scales"]),
            jax.nn.sigmoid(g["logit_opacities"]),
            g["colors"],
            views_j,
            Ks_j,
            W,
            H,
            valid=g["valid"],
        )  # [V, H, W, 3]
        feats = extract(jnp.clip(rgb, 0, 1))  # [V, 512]
        return sh_invariant_features(feats, A)

    rng = np.random.default_rng(seed)
    all_features = []
    for i in range(len(dataset)):
        mask, img, p_3d, angle, _ = dataset.get(i, view_idx=0)
        theta = 0.0 if dry_run else 2 * np.pi * rng.random()
        f = frame_features(
            variables, jnp.asarray(mask), jnp.asarray(img),
            jnp.asarray(p_3d), jnp.float32(angle), jnp.float32(theta),
        )
        all_features.append(np.asarray(f, np.float16))
        if dry_run:
            break
        if progress and (i + 1) % 100 == 0:
            print(f"  visual features: {i + 1}/{len(dataset)}")

    out = np.array(all_features)
    if not dry_run:
        np.save(config.feature_fn, out)
    return out
