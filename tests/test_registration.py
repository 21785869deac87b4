"""Registration tests — mirrors reference test/registration/
test_registration.cpp golden values (ICP_translated :161-195, the bun0->bun4
IterativeClosestPoint golden transform :236-264, fitness score :198-232)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pcl_tpu.core import from_numpy, to_numpy
from pcl_tpu.core import transforms as tf
from pcl_tpu.io import pcd
from pcl_tpu.registration import (
    icp,
    align,
    fitness_score,
    determine_correspondences,
    estimate_svd,
)
from tests.conftest import reference_pcd


class TestICPTranslated:
    """Reference TEST(PCL, ICP_translated): recover a 0.2 z-shift."""

    def test_recover_translation(self):
        c = pcd.load(reference_pcd("bun0.pcd"))
        src = from_numpy(np.asarray(c.xyz))
        dst_pts = np.asarray(c.xyz).copy()
        dst_pts[:, 2] += 0.2
        dst = from_numpy(dst_pts)
        res = icp(src, dst, max_iterations=50)
        assert bool(res.converged)
        T = np.asarray(res.transform)
        np.testing.assert_allclose(np.diag(T)[:3], 1.0, atol=2e-3)
        np.testing.assert_allclose(T[:3, 3], [0, 0, 0.2], atol=2e-3)
        assert float(res.fitness) < 1e-6


class TestICPBunny:
    """Reference TEST(PCL, IterativeClosestPoint): bun0 -> bun4 golden
    transform (test_registration.cpp:251-264)."""

    GOLDEN = np.array([
        [0.8806, 0.036481287330389023, -0.4724, 0.03453],
        [-0.02354, 0.9992, 0.03326, -0.001519],
        [0.4732, -0.01817, 0.8808, 0.04116],
        [0, 0, 0, 1],
    ])

    def test_golden_transform(self):
        src = pcd.load(reference_pcd("bun0.pcd"))
        dst = pcd.load(reference_pcd("bun4.pcd"))
        res = icp(
            src, dst,
            max_corr_dist=0.05,
            max_iterations=50,
            transformation_eps=1e-8,
        )
        T = np.asarray(res.transform)
        # same per-element tolerances as the reference test (1e-3, 1e-2 for 0,1)
        assert abs(T[0, 0] - self.GOLDEN[0, 0]) < 1e-3
        assert abs(T[0, 1] - self.GOLDEN[0, 1]) < 1e-2
        assert abs(T[0, 2] - self.GOLDEN[0, 2]) < 1e-3
        assert abs(T[0, 3] - self.GOLDEN[0, 3]) < 1e-3
        assert abs(T[1, 0] - self.GOLDEN[1, 0]) < 1e-3
        assert abs(T[1, 1] - self.GOLDEN[1, 1]) < 1e-3
        assert abs(T[1, 2] - self.GOLDEN[1, 2]) < 1e-3
        assert abs(T[1, 3] - self.GOLDEN[1, 3]) < 1e-3
        assert abs(T[2, 0] - self.GOLDEN[2, 0]) < 1e-3
        assert abs(T[2, 1] - self.GOLDEN[2, 1]) < 1e-3
        assert abs(T[2, 2] - self.GOLDEN[2, 2]) < 1e-3
        assert abs(T[2, 3] - self.GOLDEN[2, 3]) < 1e-3
        np.testing.assert_array_equal(T[3], [0, 0, 0, 1])


class TestFitnessScore:
    def test_mean_squared_distance(self):
        """Reference Registration_getFitnessScore: mean sq dist = 0.0625."""
        src = from_numpy(np.array([[0, 0, 0], [0, 1, 0], [0, 0, 1], [10, 0, 0]], np.float32))
        dst = from_numpy(np.array([[0, 0, 0], [0, 1, 0], [0, 0, 1], [10, 0, 0.5]], np.float32))
        f = fitness_score(src, dst, jnp.eye(4))
        np.testing.assert_allclose(float(f), 0.0625, atol=1e-4)


class TestICPVariants:
    def _make_pair(self, rng, n=500):
        # smooth surface z = f(x, y) so normals are meaningful
        xy = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        pts = np.column_stack([xy, z]).astype(np.float32)
        # analytic normals
        dzdx = 0.6 * np.cos(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        dzdy = -0.6 * np.sin(2 * xy[:, 0]) * np.sin(2 * xy[:, 1])
        nrm = np.column_stack([-dzdx, -dzdy, np.ones(n)]).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        return pts, nrm

    def test_point_to_plane(self, rng):
        pts, nrm = self._make_pair(rng)
        xi = np.array([0.05, -0.03, 0.04, 0.03, -0.02, 0.05], np.float32)
        T_true = np.asarray(tf.se3_exp(jnp.asarray(xi)))
        src = from_numpy(pts)
        dst = from_numpy(pts @ T_true[:3, :3].T + T_true[:3, 3], {"normal": nrm @ T_true[:3, :3].T})
        res = icp(src, dst, variant="point_to_plane", max_iterations=30)
        np.testing.assert_allclose(np.asarray(res.transform), T_true, atol=2e-3)

    def test_symmetric(self, rng):
        pts, nrm = self._make_pair(rng)
        xi = np.array([0.05, -0.03, 0.04, 0.03, -0.02, 0.05], np.float32)
        T_true = np.asarray(tf.se3_exp(jnp.asarray(xi)))
        src = from_numpy(pts, {"normal": nrm})
        dst = from_numpy(pts @ T_true[:3, :3].T + T_true[:3, 3], {"normal": nrm @ T_true[:3, :3].T})
        res = icp(src, dst, variant="symmetric", max_iterations=30)
        np.testing.assert_allclose(np.asarray(res.transform), T_true, atol=2e-3)

    def test_reciprocal(self, rng):
        pts = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
        src = from_numpy(pts)
        dst = from_numpy(pts + np.array([0.01, 0.02, -0.01], np.float32))
        res = icp(src, dst, reciprocal=True, max_iterations=20)
        np.testing.assert_allclose(
            np.asarray(res.transform)[:3, 3], [0.01, 0.02, -0.01], atol=1e-3
        )

    def test_no_correspondences_fails_gracefully(self, rng):
        src = from_numpy(rng.normal(size=(50, 3)).astype(np.float32))
        dst = from_numpy(rng.normal(size=(50, 3)).astype(np.float32) + 100.0)
        res = icp(src, dst, max_corr_dist=0.1, max_iterations=10)
        assert not bool(res.converged)
        assert int(res.convergence_state) == -1

    def test_with_init_guess(self, rng):
        pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
        src = from_numpy(pts)
        xi = np.array([0.3, 0.1, -0.2, 0.2, 0.3, -0.1], np.float32)
        T_true = np.asarray(tf.se3_exp(jnp.asarray(xi)))
        dst = from_numpy(pts @ T_true[:3, :3].T + T_true[:3, 3])
        # large motion: plain ICP may fail, but with a near-truth guess it locks in
        guess = np.asarray(tf.se3_exp(jnp.asarray(xi * 0.9)))
        res = icp(src, dst, init_transform=jnp.asarray(guess), max_iterations=30)
        np.testing.assert_allclose(np.asarray(res.transform), T_true, atol=5e-3)


class TestAlign:
    def test_align_returns_transformed_cloud(self, rng):
        pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
        src = from_numpy(pts)
        dst = from_numpy(pts + np.float32([0.05, 0, 0]))
        out, res = align(src, dst, max_iterations=20)
        np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(dst.xyz), atol=1e-3)
