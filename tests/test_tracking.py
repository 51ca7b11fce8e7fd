"""Tracking + adversarial-PCA tests."""

import numpy as np
import pytest

from pose_splatter_tpu.preprocess.apca import AAPCA
from pose_splatter_tpu.tracking import (
    axes_to_yaw_angles,
    optimal_transport_map,
    track_principal_axes,
)


class TestTracking:
    def _make_sequence(self, T=30, seed=0):
        """Elongated Gaussian rotating slowly while moving forward."""
        rng = np.random.default_rng(seed)
        means, covs = [], []
        pos = np.zeros(3)
        for t in range(T):
            angle = 0.08 * t
            d = np.array([np.cos(angle), np.sin(angle), 0.0])
            pos = pos + 0.1 * d
            R = np.array([
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1.0],
            ])
            cov = R @ np.diag([4.0, 1.0, 0.5]) @ R.T
            means.append(pos.copy())
            covs.append(cov)
        return np.array(means), np.array(covs)

    def test_axes_are_unit(self):
        means, covs = self._make_sequence()
        axes = track_principal_axes(means, covs)
        assert np.allclose(np.linalg.norm(axes, axis=1), 1.0, atol=1e-6)

    def test_sign_continuity(self):
        """Consecutive axes never flip (dot > 0 for a smooth sequence)."""
        means, covs = self._make_sequence()
        axes = track_principal_axes(means, covs)
        dots = np.sum(axes[:-1] * axes[1:], axis=1)
        assert (dots > 0).all()

    def test_motion_correlation(self):
        """Global sign correlates with the direction of motion
        (tracking.py:106-112)."""
        means, covs = self._make_sequence()
        axes = track_principal_axes(means, covs)
        displacements = np.diff(means, axis=0)
        assert np.sum(displacements * axes[1:]) > 0

    def test_angles_track_rotation(self):
        means, covs = self._make_sequence()
        axes = track_principal_axes(means, covs)
        angles = axes_to_yaw_angles(axes)
        # The yaw sequence should advance ~0.08 rad/frame (mod pi flips).
        d = np.diff(np.unwrap(angles))
        assert abs(np.median(d) - 0.08) < 0.02

    def test_ot_map_identity(self):
        mean = np.zeros(3)
        cov = np.diag([2.0, 1.0, 0.5])
        x = np.array([1.0, -0.5, 0.2])
        out = optimal_transport_map(mean, cov, mean, cov, x)
        assert np.allclose(out, x, atol=1e-8)

    def test_ot_map_shift(self):
        cov = np.eye(3)
        out = optimal_transport_map(np.zeros(3), cov, np.ones(3), cov,
                                    np.array([0.5, 0, 0]))
        assert np.allclose(out, [1.5, 1.0, 1.0], atol=1e-8)


class TestAAPCA:
    def test_reduces_to_pca_at_mu_zero(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(200, 20)) @ np.diag(np.linspace(3, 0.1, 20))
        Y = rng.normal(size=(200, 2))
        model = AAPCA(5, mu=0.0, pow_iter=100, random_state=0)
        Z = model.fit_transform(X, Y)
        # Captured variance should match top-5 PCA variance closely.
        from sklearn.decomposition import PCA

        pca_var = PCA(5).fit(X).explained_variance_.sum()
        ours_var = Z.var(axis=0, ddof=1).sum()
        assert ours_var > 0.95 * pca_var

    def test_removes_adversarial_subspace(self):
        """With large mu, Y must not be linearly predictable from Z."""
        rng = np.random.default_rng(1)
        n = 400
        Y = rng.normal(size=(n, 2))
        noise = rng.normal(size=(n, 20))
        # X strongly encodes Y in its first 2 columns.
        X = np.concatenate([5.0 * Y, noise], axis=1)

        from sklearn.metrics import r2_score

        weak = AAPCA(5, mu=0.0, pow_iter=100, random_state=0)
        weak.fit(X, Y)
        _, y_weak = weak.reconstruct(X, Y)
        strong = AAPCA(5, mu=1e3, pow_iter=100, random_state=0)
        strong.fit(X, Y)
        _, y_strong = strong.reconstruct(X, Y)
        assert r2_score(Y, y_strong) < r2_score(Y, y_weak) - 0.3

    def test_components_orthonormal(self):
        rng = np.random.default_rng(2)
        X = rng.normal(size=(100, 15))
        Y = rng.normal(size=(100, 2))
        model = AAPCA(4, mu=10.0, random_state=0)
        model.fit(X, Y)
        W = model.components_
        assert np.allclose(W.T @ W, np.eye(4), atol=1e-8)


class TestPlotEllipses:
    def test_writes_file(self, tmp_path):
        from pose_splatter_tpu.viz.plots import plot_ellipses

        rng = np.random.default_rng(0)
        T = 12
        means = np.cumsum(0.1 * rng.normal(size=(T, 3)), axis=0)
        A = rng.normal(size=(T, 3, 3)) * 0.1
        covs = A @ A.transpose(0, 2, 1) + 0.05 * np.eye(3)
        out = plot_ellipses(means, covs, str(tmp_path / "e.pdf"))
        import os
        assert os.path.exists(out) and os.path.getsize(out) > 0
