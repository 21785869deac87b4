"""Tests — 2D corner detectors, smoothed-surfaces keypoints, pyramidal KLT,
KLD-adaptive particle filter, adaptive-cost SO stereo, DEM."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu.keypoints import (
    agast_keypoints,
    brisk_keypoints,
    brisk_descriptor,
    trajkovic_keypoints,
    smoothed_surfaces_keypoints,
)
from pcl_tpu.tracking import init_kld_tracker, step_tracker_kld, pyramidal_klt
from pcl_tpu.stereo import adaptive_cost_so_matching, disparity_to_dem


def _corner_image():
    img = np.zeros((48, 48), np.float32)
    img[16:32, 16:32] = 200.0  # bright square: 4 corners
    return img


class TestCorners2D:
    def test_agast_square_corners(self):
        kps = agast_keypoints(_corner_image(), threshold=20.0)
        assert len(kps) >= 4
        expected = {(16, 16), (16, 31), (31, 16), (31, 31)}
        found = 0
        for ey, ex in expected:
            d = np.abs(kps - [ey, ex]).sum(1).min()
            found += d <= 2
        assert found == 4

    def test_agast_flat_image_empty(self):
        img = np.full((32, 32), 50.0, np.float32)
        assert len(agast_keypoints(img, threshold=10.0)) == 0

    def test_brisk_multiscale(self):
        kps = brisk_keypoints(_corner_image(), threshold=20.0, octaves=2)
        assert len(kps) >= 4
        assert set(np.unique(kps[:, 2])) <= {0, 1}

    def test_brisk_descriptor_stable(self):
        img = _corner_image()
        kps = agast_keypoints(img, threshold=20.0)[:4]
        d1 = brisk_descriptor(img, kps)
        d2 = brisk_descriptor(img + 5.0, kps)  # brightness shift invariant
        assert d1.shape[0] == 4 and d1.dtype == bool
        assert (d1 == d2).mean() > 0.95

    def test_trajkovic(self):
        kps = trajkovic_keypoints(_corner_image(), threshold=100.0)
        assert len(kps) >= 4
        # edges should NOT respond (interior of edges suppressed by min-over-dirs)
        for y, x in kps:
            assert not (18 < y < 30 and (abs(x - 16) < 1 or abs(x - 31) < 1)
                        and 18 < y < 30)


class TestSmoothedSurfaces:
    def test_bump_detected(self, rng):
        # plane with one bump: smoothing displaces the bump most
        g = np.stack(np.meshgrid(np.linspace(-1, 1, 20), np.linspace(-1, 1, 20)), -1)
        pts = np.concatenate([g.reshape(-1, 2), np.zeros((400, 1))], 1).astype(np.float32)
        bump = np.exp(-((g[..., 0]) ** 2 + (g[..., 1]) ** 2) / 0.02).reshape(-1)
        pts[:, 2] = 0.3 * bump
        c = make_cloud(jnp.asarray(pts)).with_attrs(
            normal=jnp.asarray(np.tile([0, 0, 1.0], (400, 1)).astype(np.float32))
        )
        from pcl_tpu.surface import surfel_smoothing
        s1 = surfel_smoothing(c, radius=0.25, max_iterations=2)
        s2 = surfel_smoothing(c, radius=0.5, max_iterations=2)
        kp = smoothed_surfaces_keypoints(c, [s1, s2], neighborhood_radius=0.4)
        center = np.argmax(bump)
        assert kp[center]
        assert kp.sum() < 40  # sparse


class TestKLT:
    def test_translation_flow(self):
        rng = np.random.default_rng(3)
        base = rng.uniform(0, 255, (64, 64)).astype(np.float32)
        # smooth to make gradients informative
        from scipy.ndimage import gaussian_filter
        a = gaussian_filter(base, 2.0).astype(np.float32)
        b = np.roll(np.roll(a, 3, 0), -2, 1)  # dy=3, dx=-2
        pts = np.array([[20, 20], [32, 40], [40, 25]], np.float32)
        new, ok = pyramidal_klt(a, b, pts, levels=3, window_radius=5)
        assert ok.all()
        np.testing.assert_allclose(new - pts, [[3, -2]] * 3, atol=0.3)


class TestKLD:
    def test_tracks_and_adapts(self, rng):
        ref_pts = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        ref = make_cloud(jnp.asarray(ref_pts))
        state = init_kld_tracker(max_particles=256, key=jnp.asarray(
            np.asarray(__import__("jax").random.PRNGKey(1))))
        t_true = np.float32([0.05, -0.03, 0.02])
        scene = make_cloud(jnp.asarray(ref_pts + t_true))
        pose = None
        for _ in range(6):
            state, pose = step_tracker_kld(state, ref, scene,
                                           coherence_sigma=0.05,
                                           bin_size=0.2, epsilon=0.1)
        t_est = np.asarray(pose)[:3, 3]
        np.testing.assert_allclose(t_est, t_true, atol=0.02)
        # converged population should shrink below max
        assert int(np.asarray(state.active).sum()) < 256


class TestAdaptiveSO:
    def test_known_disparity(self):
        rng = np.random.default_rng(7)
        from scipy.ndimage import gaussian_filter
        tex = gaussian_filter(
            rng.uniform(0, 255, (40, 80)).astype(np.float32), 1.0
        )
        d_true = 6
        left = tex
        right = np.roll(tex, -d_true, axis=1)
        disp = np.asarray(
            adaptive_cost_so_matching(
                jnp.asarray(left), jnp.asarray(right), max_disparity=16
            )
        )
        core = disp[5:-5, 20:-5]
        valid = core[core >= 0]
        assert (np.abs(valid - d_true) <= 1).mean() > 0.9


class TestDEM:
    def test_grid_average(self):
        H, W = 32, 64
        disp = np.full((H, W), 8.0, np.float32)
        inten = np.ones((H, W), np.float32)
        h, cnt = disparity_to_dem(
            jnp.asarray(disp), jnp.asarray(inten), focal=50.0, baseline=0.1,
            cx=W / 2, cy=H / 2, dem_cols=8, dem_disp_bins=4,
        )
        h, cnt = np.asarray(h), np.asarray(cnt)
        assert cnt.sum() == H * W
        # constant disparity -> a single disparity bin occupied
        assert (cnt.sum(0) > 0).sum() == 1
