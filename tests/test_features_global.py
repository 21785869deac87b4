"""Tests for CVFH/OUR-CVFH, CRH (+alignment), GASD, integral-image normals."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_RGB
from pcl_tpu.features import (
    estimate_cvfh, estimate_our_cvfh, estimate_crh, crh_align,
    estimate_gasd, estimate_gasd_color, integral_image_normals,
    estimate_normals,
)


def two_planes(rng, n=400):
    uv = rng.uniform(-0.5, 0.5, size=(n, 2)).astype(np.float32)
    p1 = np.stack([uv[:, 0], uv[:, 1], np.full(n, -0.6, np.float32)], 1)
    p2 = np.stack([uv[:, 0], np.full(n, 0.6, np.float32), uv[:, 1]], 1)
    c = Cloud(xyz=jnp.asarray(np.concatenate([p1, p2])), mask=jnp.ones(2 * n, bool))
    return estimate_normals(c, k=12, viewpoint=jnp.asarray([0.0, 0.0, 5.0]))


class TestCVFH:
    def test_two_planes_two_clusters(self, rng):
        c = two_planes(rng)
        res = estimate_cvfh(c, viewpoint=jnp.asarray([0.0, 0.0, 5.0]))
        assert int(jnp.sum(res.valid)) == 2
        h = np.asarray(res.histograms)[np.asarray(res.valid)]
        assert h.shape[1] == 308
        assert (h.sum(1) > 0).all()
        # the two cluster descriptors differ (different orientations)
        assert np.abs(h[0] - h[1]).sum() > 1.0

    def test_our_cvfh_appends_roll(self, rng):
        c = two_planes(rng)
        res = estimate_our_cvfh(c, viewpoint=jnp.asarray([0.0, 0.0, 5.0]))
        assert res.histograms.shape[1] == 308 + 90


class TestCRH:
    def test_roll_recovery(self, rng):
        # structured cloud; rotate about the view axis by a known roll
        n = 500
        pts = rng.normal(size=(n, 3)).astype(np.float32) * np.float32([0.5, 0.2, 0.05])
        pts[:, 2] += 2.0
        c1 = estimate_normals(
            Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(n, bool)), k=12)
        roll = 0.7
        R = np.array([[np.cos(roll), -np.sin(roll), 0],
                      [np.sin(roll), np.cos(roll), 0],
                      [0, 0, 1]], np.float32)
        ctr = pts.mean(0)
        pts2 = (pts - ctr) @ R.T + ctr
        c2 = estimate_normals(
            Cloud(xyz=jnp.asarray(pts2.astype(np.float32)), mask=jnp.ones(n, bool)), k=12)
        # viewpoint on the centroid axis so the roll is about z
        vp = jnp.asarray([ctr[0], ctr[1], ctr[2] - 5.0])
        h1 = estimate_crh(c1, viewpoint=vp)
        h2 = estimate_crh(c2, viewpoint=vp)
        angles, scores = crh_align(h2, h1, n_peaks=3)
        best = np.asarray(angles)
        # one of the top peaks should be near +-roll (sign depends on axis
        # orientation); histograms are pi-symmetric for line-like clouds so
        # accept the pi-shifted alias too
        def angdiff(a, b):
            return np.abs((a - b + np.pi) % (2 * np.pi) - np.pi)
        d = np.minimum.reduce([
            angdiff(best, roll), angdiff(best, -roll),
            angdiff(best, roll - np.pi), angdiff(best, np.pi - roll),
        ])
        assert d.min() < 0.15


class TestGASD:
    def test_pose_invariance(self, rng):
        from pcl_tpu.core.transforms import se3_exp
        pts = rng.normal(size=(600, 3)).astype(np.float32) * np.float32([1, 0.5, 0.2])
        c1 = Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(600, bool))
        T = np.asarray(se3_exp(jnp.asarray([0.5, -0.2, 0.8, 0.4, -0.3, 0.6], jnp.float32)))
        pts2 = pts @ T[:3, :3].T + T[:3, 3]
        c2 = Cloud(xyz=jnp.asarray(pts2.astype(np.float32)), mask=jnp.ones(600, bool))
        g1 = np.asarray(estimate_gasd(c1))
        g2 = np.asarray(estimate_gasd(c2))
        assert abs(g1.sum() - 1) < 1e-5
        # global alignment makes the descriptor pose-invariant
        assert np.abs(g1 - g2).sum() < 0.1

    def test_color_histogram(self, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
        c = Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(300, bool),
                  attrs={ATTR_RGB: jnp.asarray(rgb)})
        g = np.asarray(estimate_gasd_color(c))
        assert g.shape == (768,)
        assert abs(g.sum() - 1) < 1e-4


class TestIntegralNormals:
    def _sloped(self, H=60, W=80):
        r_, c_ = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        x = (c_ - W / 2) * 0.01
        y = (r_ - H / 2) * 0.01
        z = 2.0 + 0.5 * x           # sloped plane
        return np.stack([x, y, z], -1).astype(np.float32)

    def test_covariance_mode_matches_plane(self):
        xyz = self._sloped()
        n, curv = integral_image_normals(
            jnp.asarray(xyz), jnp.ones(xyz.shape[:2], bool), smoothing_size=5)
        n = np.asarray(n)[5:-5, 5:-5]
        expected = np.float32([-0.5, 0.0, 1.0])
        expected /= np.linalg.norm(expected)
        # normals flip toward the origin viewpoint -> -expected
        dots = n @ (-expected)
        assert np.median(dots) > 0.999
        assert float(np.median(np.asarray(curv)[5:-5, 5:-5])) < 1e-3

    def test_gradient_mode(self):
        xyz = self._sloped()
        n, _ = integral_image_normals(
            jnp.asarray(xyz), jnp.ones(xyz.shape[:2], bool),
            smoothing_size=5, mode="gradient")
        n = np.asarray(n)[5:-5, 5:-5]
        expected = np.float32([-0.5, 0.0, 1.0])
        expected /= np.linalg.norm(expected)
        dots = n @ (-expected)
        assert np.median(np.abs(dots)) > 0.999

    def test_invalid_pixels_masked(self):
        xyz = self._sloped()
        valid = np.ones(xyz.shape[:2], bool)
        valid[10:20, 10:20] = False
        n, _ = integral_image_normals(jnp.asarray(xyz), jnp.asarray(valid))
        n = np.asarray(n)
        assert (np.linalg.norm(n[12:18, 12:18], axis=-1) == 0).all()


class TestShapeContext:
    def test_3dsc_shape_and_norm(self, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        c = estimate_normals(Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(300, bool)), k=12)
        from pcl_tpu.features import estimate_3dsc
        h = np.asarray(estimate_3dsc(c, radius=1.0, k=48))
        assert h.shape == (300, 15 * 11 * 12)
        norms = np.linalg.norm(h, axis=1)
        assert (np.abs(norms[norms > 0] - 1) < 1e-4).all()

    def test_usc_rotation_covariance(self, rng):
        from pcl_tpu.core.transforms import se3_exp
        from pcl_tpu.features import estimate_usc
        pts = rng.normal(size=(300, 3)).astype(np.float32) * np.float32([1, 0.6, 0.3])
        c1 = Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(300, bool))
        T = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0.4, -0.3, 0.5], jnp.float32)))
        pts2 = (pts @ T[:3, :3].T).astype(np.float32)
        c2 = Cloud(xyz=jnp.asarray(pts2), mask=jnp.ones(300, bool))
        h1, f1 = estimate_usc(c1, radius=1.0, k=48)
        h2, f2 = estimate_usc(c2, radius=1.0, k=48)
        h1, h2 = np.asarray(h1), np.asarray(h2)
        ok = (h1.sum(1) > 0) & (h2.sum(1) > 0)
        # unique LRF makes the descriptor rotation-invariant for most points
        diff = np.abs(h1[ok] - h2[ok]).sum(1)
        assert np.median(diff) < 0.5


class TestRoPS:
    def test_shape_and_invariance(self, rng):
        from pcl_tpu.core.transforms import se3_exp
        from pcl_tpu.features import estimate_rops
        pts = rng.normal(size=(300, 3)).astype(np.float32) * np.float32([1, 0.6, 0.3])
        c1 = Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(300, bool))
        d1, _ = estimate_rops(c1, radius=1.0, k=48)
        d1 = np.asarray(d1)
        assert d1.shape == (300, 135)
        T = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0.3, 0.2, -0.4], jnp.float32)))
        pts2 = (pts @ T[:3, :3].T).astype(np.float32)
        d2, _ = estimate_rops(Cloud(xyz=jnp.asarray(pts2), mask=jnp.ones(300, bool)),
                              radius=1.0, k=48)
        d2 = np.asarray(d2)
        ok = (np.abs(d1).sum(1) > 0) & (np.abs(d2).sum(1) > 0)
        rel = np.abs(d1[ok] - d2[ok]).sum(1) / np.maximum(np.abs(d1[ok]).sum(1), 1e-6)
        assert np.median(rel) < 0.3


class TestLRFs:
    def test_board_flare_orthonormal(self, rng):
        from pcl_tpu.features import board_lrf, flare_lrf
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        c = estimate_normals(Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(200, bool)), k=12)
        for fn in (board_lrf, flare_lrf):
            F, ok = fn(c, radius=1.0, k=32)
            F, ok = np.asarray(F), np.asarray(ok)
            assert ok.sum() > 100
            Fo = F[ok]
            eye = np.einsum("nij,nkj->nik", Fo, Fo)
            assert np.abs(eye - np.eye(3)).max() < 1e-3
            # right-handed
            det = np.linalg.det(Fo)
            assert (det > 0.99).all()


class TestPersistence:
    def test_distinct_points_survive(self, rng):
        from pcl_tpu.features import feature_persistence, estimate_fpfh
        # plane with a sharp bump: bump points are the persistent ones
        n = 500
        uv = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        z = np.where(np.linalg.norm(uv, axis=1) < 0.2, 0.3, 0.0).astype(np.float32)
        pts = np.concatenate([uv, z[:, None]], 1) + \
            rng.normal(scale=0.002, size=(n, 3)).astype(np.float32)
        c = estimate_normals(Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(n, bool)),
                             k=12, viewpoint=jnp.asarray([0.0, 0.0, 10.0]))
        # scale = neighborhood size (k is pcl_tpu's fixed-shape analog of
        # the reference's per-scale radius)
        persistent, _ = feature_persistence(
            lambda s: estimate_fpfh(c, k=int(s)),
            scales=[20, 32], mask=c.mask, alpha=1.0)
        persistent = np.asarray(persistent)
        bump_ring = (np.linalg.norm(uv, axis=1) > 0.12) & (np.linalg.norm(uv, axis=1) < 0.28)
        flat = np.linalg.norm(uv, axis=1) > 0.5
        # persistence rate much higher near the bump edge than on the flat
        assert persistent[bump_ring].mean() > 3 * max(persistent[flat].mean(), 0.01)
