"""Tests for the extended filter set + tracking."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud, ATTR_NORMAL, ATTR_INTENSITY
from pcl_tpu import filters, sac
from pcl_tpu.core import transforms as tf


class TestFrustum:
    def test_culling(self, rng):
        pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        out = filters.frustum_culling(c, jnp.eye(4), h_fov=np.pi / 2,
                                      v_fov=np.pi / 2, near=0.5, far=4.0)
        m = np.asarray(out.mask)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        expect = (x >= 0.5) & (x <= 4.0) & \
                 (np.abs(np.arctan2(y, x)) <= np.pi / 4) & \
                 (np.abs(np.arctan2(z, x)) <= np.pi / 4)
        np.testing.assert_array_equal(m, expect)


class TestProjection:
    def test_project_inliers_plane(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        coeffs = jnp.asarray([0.0, 0.0, 1.0, -0.5])   # z = 0.5
        out = filters.project_inliers(c, sac.PlaneModel(), coeffs)
        z = np.asarray(out.xyz)[:, 2]
        np.testing.assert_allclose(z, 0.5, atol=1e-5)

    def test_model_outlier_removal(self, rng):
        plane = np.stack([rng.uniform(-1, 1, 100), rng.uniform(-1, 1, 100),
                          np.zeros(100)], 1).astype(np.float32)
        off = plane + np.float32([0, 0, 1.0])
        c = make_cloud(jnp.asarray(np.concatenate([plane, off])))
        coeffs = jnp.asarray([0.0, 0.0, 1.0, 0.0])
        out = filters.model_outlier_removal(c, sac.PlaneModel(), coeffs, 0.1)
        m = np.asarray(out.mask)
        assert m[:100].all() and not m[100:].any()


class TestGrid2D:
    def test_grid_minimum(self, rng):
        xy = rng.uniform(0, 4, size=(300, 2)).astype(np.float32)
        z = rng.uniform(0, 2, size=(300, 1)).astype(np.float32)
        pts = np.concatenate([xy, z], 1)
        c = make_cloud(jnp.asarray(pts))
        out = filters.grid_minimum(c, resolution=1.0)
        m = np.asarray(out.mask)
        cells = np.floor(xy).astype(int)
        for cx in range(4):
            for cy in range(4):
                sel = (cells[:, 0] == cx) & (cells[:, 1] == cy)
                if sel.any():
                    kept = np.flatnonzero(m & sel)
                    assert len(kept) == 1
                    assert z[kept[0], 0] == z[sel, 0].min()

    def test_local_maximum(self, rng):
        pts = np.array([[0, 0, 1.0], [0.1, 0, 0.5], [5, 5, 2.0]], np.float32)
        c = make_cloud(jnp.asarray(pts))
        out = filters.local_maximum(c, radius=1.0, cap=8)
        m = np.asarray(out.mask)
        assert m[0] and not m[1] and m[2]


class TestBilateralAndNormals:
    def test_bilateral_smooths(self, rng):
        pts = rng.uniform(0, 1, size=(400, 3)).astype(np.float32)
        inten = (pts[:, 0] > 0.5).astype(np.float32) + \
            rng.normal(scale=0.05, size=400).astype(np.float32)
        c = make_cloud(jnp.asarray(pts)).with_attrs(
            **{ATTR_INTENSITY: jnp.asarray(inten)})
        out = filters.bilateral_filter(c, sigma_s=0.1, sigma_r=0.2)
        i2 = np.asarray(out.attrs[ATTR_INTENSITY])
        interior = np.abs(pts[:, 0] - 0.5) > 0.15
        # noise reduced away from the edge, edge preserved
        resid = i2 - (pts[:, 0] > 0.5)
        assert resid[interior].std() < 0.05

    def test_normal_refinement(self, rng):
        pts = np.stack([rng.uniform(0, 2, 300), rng.uniform(0, 2, 300),
                        np.zeros(300)], 1).astype(np.float32)
        n = np.tile(np.float32([0, 0, 1]), (300, 1))
        n += rng.normal(scale=0.2, size=n.shape).astype(np.float32)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        c = make_cloud(jnp.asarray(pts)).with_attrs(**{ATTR_NORMAL: jnp.asarray(n)})
        out = filters.normal_refinement(c, k=12)
        n2 = np.asarray(out.attrs[ATTR_NORMAL])
        assert (n2[:, 2] > 0.99).mean() > 0.95


class TestMorphologicalGround:
    def test_ground_extraction(self, rng):
        # flat ground + a box object
        gx = rng.uniform(0, 20, size=(800, 2)).astype(np.float32)
        ground = np.concatenate([gx, rng.normal(scale=0.02, size=(800, 1)).astype(np.float32)], 1)
        bx = rng.uniform(8, 10, size=(150, 2)).astype(np.float32)
        box = np.concatenate([bx, rng.uniform(0.5, 2.0, size=(150, 1)).astype(np.float32)], 1)
        pts = np.concatenate([ground, box])
        c = make_cloud(jnp.asarray(pts))
        gmask = np.asarray(filters.progressive_morphological_filter(
            c, cell_size=1.0, max_window_size=9, grid=64))
        assert gmask[:800].mean() > 0.95
        assert gmask[800:].mean() < 0.1


class TestApproxVoxel:
    def test_downsamples(self, rng):
        pts = rng.uniform(0, 1, size=(2000, 3)).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        out = filters.approximate_voxel_grid(c, 0.25)
        n = int(out.count)
        assert 30 <= n <= 70    # ~4^3 occupied voxels


class TestTracking:
    def test_tracks_moving_object(self, rng):
        from pcl_tpu.tracking import init_tracker, step_tracker
        obj = rng.normal(size=(300, 3)).astype(np.float32) * 0.3
        ref = make_cloud(jnp.asarray(obj))
        state = init_tracker(256, key=jax.random.PRNGKey(0))
        true_pose = np.eye(4, dtype=np.float32)
        step = np.asarray(tf.se3_exp(jnp.asarray([0.03, -0.02, 0.01, 0.02, 0.0, 0.03], jnp.float32)))
        err = None
        for t in range(5):
            true_pose = (step @ true_pose).astype(np.float32)
            scene_pts = obj @ true_pose[:3, :3].T + true_pose[:3, 3]
            scene = make_cloud(jnp.asarray(scene_pts.astype(np.float32)))
            state, pose = step_tracker(state, ref, scene,
                                       coherence_sigma=0.1)
            err = np.abs(np.asarray(pose) - true_pose).max()
        assert err < 0.1, err


class TestCropHullConditional:
    def test_crop_hull_cube(self, rng):
        from pcl_tpu.surface import convex_hull
        from pcl_tpu.filters import crop_hull
        corners = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                            for z in (0, 1)], np.float32)
        hv, ht = convex_hull(make_cloud(jnp.asarray(corners)))
        pts = rng.uniform(-0.5, 1.5, size=(400, 3)).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        out = crop_hull(c, hv, ht)
        m = np.asarray(out.mask)
        inside = ((pts > 0) & (pts < 1)).all(axis=1)
        assert (m == inside).mean() > 0.98

    def test_conditional_removal(self, rng):
        from pcl_tpu import filters as F
        pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        cond = F.and_(F.gt(F.field("z"), 0.0), F.lt(F.field("x"), 0.5))
        out = F.conditional_removal(c, cond)
        m = np.asarray(out.mask)
        expect = (pts[:, 2] > 0) & (pts[:, 0] < 0.5)
        np.testing.assert_array_equal(m, expect)

    def test_median_filter_organized(self, rng):
        from pcl_tpu.filters import median_filter
        from pcl_tpu.core.cloud import make_cloud as mk
        H, W = 20, 30
        v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        z = np.ones((H, W), np.float32)
        z[10, 15] = 5.0  # salt noise
        xyz = np.stack([u, v, z], -1).reshape(-1, 3).astype(np.float32)
        c = mk(jnp.asarray(xyz), width=W, height=H)
        out = median_filter(c, window=3)
        z2 = np.asarray(out.xyz)[:, 2].reshape(H, W)
        assert abs(z2[10, 15] - 1.0) < 1e-5


class TestSupervoxels:
    def test_blob_partition(self, rng):
        from pcl_tpu.segmentation import supervoxel_clustering
        from pcl_tpu import features
        pts = rng.uniform(0, 2, size=(1500, 3)).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        c = features.estimate_normals(c, k=10)
        res = supervoxel_clustering(c, seed_resolution=0.5, max_seeds=128)
        lab = np.asarray(res.labels)
        assert (lab >= 0).mean() > 0.95
        n_sv = len(np.unique(lab[lab >= 0]))
        assert 20 <= n_sv <= 128
        # supervoxels are spatially compact: point-to-center distance bounded
        centers = np.asarray(res.centers)
        d = np.linalg.norm(pts[lab >= 0] - centers[lab[lab >= 0]], axis=1)
        assert np.percentile(d, 95) < 1.0
