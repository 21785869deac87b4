"""Filter tests (mirrors reference test/filters/test_filters.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcl_tpu.core import from_numpy, to_numpy, compact
from pcl_tpu import filters
from pcl_tpu.io import pcd
from tests.conftest import reference_pcd


class TestVoxelGrid:
    def test_basic_grid(self, rng):
        # 8 clusters at cube corners, leaf 0.5 -> 8 voxels
        corners = np.array([[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], np.float32)
        pts = (corners[:, None] * 0.9 + rng.uniform(0, 0.08, (8, 20, 3))).reshape(-1, 3).astype(np.float32)
        c = from_numpy(pts)
        out = filters.voxel_downsample(c, 0.5)
        assert int(out.count) == 8
        xyz, _ = to_numpy(out)
        # each centroid close to its cluster mean
        for corner in corners * 0.9 + 0.04:
            d = np.linalg.norm(xyz - corner, axis=1).min()
            assert d < 0.05

    def test_centroid_exact(self, rng):
        pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [2.0, 2.0, 2.0]], np.float32)
        c = from_numpy(pts)
        out = filters.voxel_downsample(c, 1.0)
        xyz, _ = to_numpy(out)
        assert len(xyz) == 2
        np.testing.assert_allclose(sorted(xyz[:, 0]), [0.2, 2.0], atol=1e-6)

    def test_attrs_averaged(self, rng):
        pts = np.array([[0.1, 0, 0], [0.2, 0, 0]], np.float32)
        c = from_numpy(pts, {"intensity": np.array([1.0, 3.0], np.float32)})
        out = filters.voxel_downsample(c, 1.0)
        _, attrs = to_numpy(out)
        np.testing.assert_allclose(attrs["intensity"], [2.0], atol=1e-6)

    def test_reference_cloud_reduces(self):
        c = pcd.load(reference_pcd("bun0.pcd"))
        out = filters.voxel_downsample(c, 0.01)
        assert 0 < int(out.count) < int(c.count)

    def test_uniform_sampling_picks_input_points(self, rng):
        pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
        c = from_numpy(pts)
        out = filters.uniform_sample(c, 0.25)
        xyz, _ = to_numpy(out)
        # every output point must be an input point
        d = np.abs(xyz[:, None] - pts[None]).sum(-1).min(1)
        assert (d < 1e-6).all()
        assert 0 < len(xyz) < 300


class TestPassThrough:
    def test_z_range(self, rng):
        pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
        c = from_numpy(pts)
        out = filters.pass_through(c, "z", 0.0, 0.5)
        keep = (pts[:, 2] >= 0) & (pts[:, 2] <= 0.5)
        assert int(out.count) == keep.sum()

    def test_negative(self, rng):
        pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
        c = from_numpy(pts)
        out = filters.pass_through(c, "x", 0.0, 1.0, negative=True)
        assert int(out.count) == (pts[:, 0] < 0).sum()

    def test_crop_box_oriented(self, rng):
        from pcl_tpu.core import transforms as tf
        pts = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
        c = from_numpy(pts)
        # box rotated 45deg around z
        T = tf.se3_exp(jnp.asarray([0, 0, 0, 0, 0, np.pi / 4], jnp.float32))
        out = filters.crop_box(c, [-1, -1, -1], [1, 1, 1], transform=T)
        R = np.asarray(T)[:3, :3]
        local = pts @ R  # R^T applied: pts @ R == (R.T @ pts.T).T
        keep = (np.abs(local) <= 1).all(1)
        assert int(out.count) == keep.sum()


class TestOutlierRemoval:
    def test_sor_removes_outlier(self, rng):
        pts = rng.normal(scale=0.1, size=(200, 3)).astype(np.float32)
        pts[0] = [5, 5, 5]  # gross outlier
        c = from_numpy(pts)
        out = filters.statistical_outlier_removal(c, mean_k=10, stddev_mult=2.0)
        m = np.asarray(out.mask)
        assert not m[0]
        assert m[1:].sum() > 150

    def test_ror(self, rng):
        pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
        pts[0] = [10, 10, 10]
        c = from_numpy(pts)
        out = filters.radius_outlier_removal(c, radius=0.3, min_neighbors=2)
        m = np.asarray(out.mask)
        assert not m[0]


class TestSampling:
    def test_random_sample(self, rng):
        c = from_numpy(rng.normal(size=(500, 3)).astype(np.float32))
        out = filters.random_sample(c, 100, jax.random.PRNGKey(0))
        assert int(out.count) == 100

    def test_fps_spread(self, rng):
        # FPS should cover the space better than the first-k points
        pts = rng.uniform(0, 1, size=(1000, 3)).astype(np.float32)
        c = from_numpy(pts)
        out = filters.farthest_point_sample(c, 50, jax.random.PRNGKey(1))
        xyz, _ = to_numpy(out)
        assert len(xyz) == 50
        # min pairwise distance should be reasonably large
        d = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        assert np.sqrt(d.min()) > 0.1

    def test_normal_space(self, rng):
        pts = rng.normal(size=(400, 3)).astype(np.float32)
        nrm = rng.normal(size=(400, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        c = from_numpy(pts, {"normal": nrm})
        out = filters.normal_space_sample(c, 64, jax.random.PRNGKey(2))
        assert int(out.count) == 64
