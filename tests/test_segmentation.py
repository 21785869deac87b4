"""Segmentation tests — synthetic blobs / plane+object scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu import segmentation as seg
from pcl_tpu import sac, features


def blobs(rng, centers, n_each=150, scale=0.05):
    pts, gt = [], []
    for i, c in enumerate(centers):
        pts.append(np.asarray(c) + rng.normal(scale=scale, size=(n_each, 3)))
        gt.append(np.full(n_each, i))
    return (np.concatenate(pts).astype(np.float32), np.concatenate(gt))


class TestEuclideanClusters:
    def test_three_blobs(self, rng):
        pts, gt = blobs(rng, [(0, 0, 0), (5, 0, 0), (0, 5, 0)])
        c = make_cloud(jnp.asarray(pts))
        labels, n = seg.euclidean_clusters(c, tolerance=0.5, k=16)
        labels = np.asarray(labels)
        assert int(n) == 3
        # every ground-truth blob maps to exactly one label
        for g in range(3):
            assert len(np.unique(labels[gt == g])) == 1
        assert len(np.unique(labels)) == 3

    def test_min_cluster_size_filters_noise(self, rng):
        pts, _ = blobs(rng, [(0, 0, 0)], n_each=200)
        noise = rng.uniform(5, 10, size=(10, 3)).astype(np.float32)
        allp = np.concatenate([pts, noise])
        c = make_cloud(jnp.asarray(allp))
        labels, _ = seg.euclidean_clusters(c, tolerance=0.5, min_cluster_size=50, k=16)
        labels = np.asarray(labels)
        assert (labels[:200] >= 0).all()
        assert (labels[200:] == -1).all()

    def test_chain_connectivity(self, rng):
        # a long chain: components must merge across sweeps
        t = np.linspace(0, 10, 500)
        pts = np.stack([t, np.zeros_like(t), np.zeros_like(t)], 1).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        labels, n = seg.euclidean_clusters(c, tolerance=0.05, k=8, backend="brute")
        assert int(n) == 1

    def test_masked_points_excluded(self, rng):
        pts, _ = blobs(rng, [(0, 0, 0)], n_each=100)
        mask = np.ones(100, bool); mask[50:] = False
        c = make_cloud(jnp.asarray(pts), jnp.asarray(mask))
        labels, _ = seg.euclidean_clusters(c, tolerance=0.5, k=8)
        labels = np.asarray(labels)
        assert (labels[50:] == -1).all()


class TestRegionGrowing:
    def test_two_perpendicular_planes(self, rng):
        # XY plane and XZ plane meeting at a right angle -> 2 regions
        n1 = 400
        a = np.stack([rng.uniform(0, 2, n1), rng.uniform(0, 2, n1), np.zeros(n1)], 1)
        b = np.stack([rng.uniform(0, 2, n1), np.zeros(n1), rng.uniform(0.05, 2, n1)], 1)
        pts = np.concatenate([a, b]).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        c = features.estimate_normals(c, k=12, viewpoint=jnp.asarray([1.0, 1.0, 5.0]))
        labels, n = seg.region_growing(c, smoothness_threshold=np.pi / 6, k=12)
        labels = np.asarray(labels)
        # plane interiors (away from the crease) get distinct labels
        interior_a = labels[:n1][a[:, 1] > 0.3]
        interior_b = labels[n1:][b[:, 2] > 0.3]
        la = np.bincount(interior_a[interior_a >= 0]).argmax()
        lb = np.bincount(interior_b[interior_b >= 0]).argmax()
        assert la != lb
        assert (interior_a == la).mean() > 0.9
        assert (interior_b == lb).mean() > 0.9


class TestSACSegmentation:
    def test_plane_extraction(self, rng):
        n1 = 500
        plane = np.stack([rng.uniform(-2, 2, n1), rng.uniform(-2, 2, n1),
                          np.zeros(n1)], 1).astype(np.float32)
        obj = rng.normal(size=(100, 3)).astype(np.float32) * 0.3 + np.float32([0, 0, 1.0])
        allp = np.concatenate([plane, obj])
        c = make_cloud(jnp.asarray(allp))
        res = seg.sac_segmentation(c, sac.PlaneModel(), 0.02,
                                   key=jax.random.PRNGKey(0))
        inl = np.asarray(res.inliers)
        assert inl[:n1].mean() > 0.99
        assert inl[n1:].mean() < 0.05

    def test_segment_differences(self, rng):
        a_pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
        b_pts = a_pts[:200]  # shared subset
        a = make_cloud(jnp.asarray(a_pts))
        b = make_cloud(jnp.asarray(b_pts))
        diff = seg.segment_differences(a, b, 0.01)
        m = np.asarray(diff.mask)
        assert not m[:200].any()
        assert m[200:].all()
