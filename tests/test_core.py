"""Core data model + math tests (mirrors reference test/common/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcl_tpu.core import Cloud, make_cloud, from_numpy, to_numpy, concat, compact
from pcl_tpu.core import geometry as geo
from pcl_tpu.core import transforms as tf


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(tf.quat_to_matrix(jnp.asarray(q, jnp.float32)))


class TestCloud:
    def test_roundtrip(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        c = from_numpy(pts, {"intensity": rng.normal(size=100).astype(np.float32)})
        xyz, attrs = to_numpy(c)
        np.testing.assert_allclose(xyz, pts, rtol=1e-6)
        assert "intensity" in attrs

    def test_nan_handling(self, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        pts[7] = np.nan
        pts[23, 1] = np.inf
        c = from_numpy(pts)
        assert int(c.count) == 48
        assert np.isfinite(np.asarray(c.xyz)).all()

    def test_padding(self, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        c = from_numpy(pts, capacity=64)
        assert c.capacity == 64
        assert int(c.count) == 10

    def test_pytree(self, rng):
        c = from_numpy(rng.normal(size=(10, 3)).astype(np.float32), capacity=16)

        @jax.jit
        def shift(cloud):
            return cloud.with_xyz(cloud.xyz + 1.0)

        c2 = shift(c)
        assert isinstance(c2, Cloud)
        np.testing.assert_allclose(
            np.asarray(c2.xyz)[:10], np.asarray(c.xyz)[:10] + 1.0, rtol=1e-6
        )

    def test_concat(self, rng):
        a = from_numpy(rng.normal(size=(5, 3)).astype(np.float32))
        b = from_numpy(rng.normal(size=(7, 3)).astype(np.float32))
        c = concat(a, b)
        assert c.capacity == 12
        assert int(c.count) == 12

    def test_compact(self, rng):
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        mask = np.zeros(20, bool)
        mask[[3, 5, 11]] = True
        c = make_cloud(pts, mask)
        cc = compact(c)
        m = np.asarray(cc.mask)
        assert m[:3].all() and not m[3:].any()
        np.testing.assert_allclose(np.asarray(cc.xyz)[:3], pts[[3, 5, 11]], rtol=1e-6)


class TestGeometry:
    def test_centroid_masked(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        mask = rng.random(100) < 0.7
        c = geo.centroid(jnp.where(jnp.asarray(mask)[:, None], pts, 0.0), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(c), pts[mask].mean(axis=0), atol=1e-5)

    def test_covariance(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32) * np.array([3.0, 1.0, 0.1])
        mask = np.ones(200, bool)
        mu, cov, n = geo.mean_and_covariance(jnp.asarray(pts), jnp.asarray(mask))
        expected = np.cov(pts.T, bias=True)
        np.testing.assert_allclose(np.asarray(cov), expected, rtol=5e-3, atol=1e-4)
        assert int(n) == 200

    def test_eigh33_vs_numpy(self, rng):
        A = rng.normal(size=(500, 3, 3)).astype(np.float32)
        A = A + np.swapaxes(A, -1, -2)
        lam, V = geo.eigh33(jnp.asarray(A))
        lam_np = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(lam), lam_np, atol=2e-4 * np.abs(lam_np).max())
        # eigenvector property: ||A v - lam v|| small
        Av = np.einsum("nij,njk->nik", A, np.asarray(V))
        lv = np.asarray(lam)[:, None, :] * np.asarray(V)
        np.testing.assert_allclose(Av, lv, atol=5e-3)

    def test_eigh33_degenerate(self):
        A = jnp.stack([jnp.eye(3), jnp.zeros((3, 3)), jnp.diag(jnp.array([1.0, 1.0, 2.0]))])
        lam, V = geo.eigh33(A)
        assert np.isfinite(np.asarray(lam)).all()
        assert np.isfinite(np.asarray(V)).all()
        # orthonormality
        VtV = np.einsum("nij,nik->njk", np.asarray(V), np.asarray(V))
        np.testing.assert_allclose(VtV, np.tile(np.eye(3), (3, 1, 1)), atol=1e-4)

    def test_umeyama_exact(self, rng):
        src = rng.normal(size=(50, 3)).astype(np.float32)
        R = random_rotation(rng)
        t = np.array([0.3, -0.2, 0.7], np.float32)
        dst = src @ R.T + t
        w = np.ones(50, np.float32)
        T = geo.umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(T)[:3, :3], R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(T)[:3, 3], t, atol=1e-4)

    def test_umeyama_weighted_ignores_outliers(self, rng):
        src = rng.normal(size=(50, 3)).astype(np.float32)
        R = random_rotation(rng)
        t = np.array([0.1, 0.2, 0.3], np.float32)
        dst = src @ R.T + t
        dst[:5] += 100.0  # outliers
        w = np.ones(50, np.float32)
        w[:5] = 0.0
        T = geo.umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(T)[:3, :3], R, atol=1e-4)

    def test_umeyama_scale(self, rng):
        src = rng.normal(size=(50, 3)).astype(np.float32)
        R = random_rotation(rng)
        dst = 2.5 * src @ R.T
        T = geo.umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.ones(50), with_scale=True)
        np.testing.assert_allclose(np.asarray(T)[:3, :3], 2.5 * R, atol=1e-3)

    def test_pairwise_sqdist(self, rng):
        a = rng.normal(size=(20, 3)).astype(np.float32)
        b = rng.normal(size=(30, 3)).astype(np.float32)
        d = np.asarray(geo.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
        expected = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, expected, atol=1e-4)


class TestTransforms:
    def test_se3_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(100, 6)).astype(np.float32) * 0.5
        T = tf.se3_exp(jnp.asarray(xi))
        xi2 = tf.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)

    def test_so3_log_near_pi(self):
        # 180-degree rotations around axes
        for axis in np.eye(3):
            R = tf.so3_exp(jnp.asarray(axis * np.pi, jnp.float32))
            w = np.asarray(tf.so3_log(R))
            np.testing.assert_allclose(np.abs(w), axis * np.pi, atol=1e-2)

    def test_transform_inverse(self, rng):
        xi = rng.normal(size=6).astype(np.float32)
        T = tf.se3_exp(jnp.asarray(xi))
        I = np.asarray(T @ tf.invert_rigid(T))
        np.testing.assert_allclose(I, np.eye(4), atol=1e-5)

    def test_transform_cloud_normals(self, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        nrm = rng.normal(size=(10, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        c = from_numpy(pts, {"normal": nrm})
        R = random_rotation(rng)
        T = tf.from_rt(jnp.asarray(R), jnp.asarray([1.0, 2.0, 3.0]))
        c2 = tf.transform_cloud(T, c)
        np.testing.assert_allclose(np.asarray(c2.xyz), pts @ R.T + [1, 2, 3], atol=1e-4)
        np.testing.assert_allclose(np.asarray(c2.attrs["normal"]), nrm @ R.T, atol=1e-4)

    def test_quat_roundtrip(self, rng):
        q = rng.normal(size=(50, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q *= np.sign(q[:, :1])
        R = tf.quat_to_matrix(jnp.asarray(q))
        q2 = np.asarray(tf.matrix_to_quat(R))
        np.testing.assert_allclose(np.abs(q2), np.abs(q), atol=1e-4)
