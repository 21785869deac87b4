"""Sample-consensus tests — synthetic shapes + outliers (mirrors the
reference's test/sample_consensus strategy of fitting known models)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcl_tpu import sac


def _key(i=0):
    return jax.random.PRNGKey(i)


def make_plane(rng, n=300, normal=(0, 0, 1), d=-0.5, noise=0.005):
    normal = np.asarray(normal, np.float64)
    normal = (normal / np.linalg.norm(normal)).astype(np.float32)
    basis = np.linalg.svd(normal[None, :])[2][1:]  # 2 vectors orthogonal to n
    uv = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    pts = uv @ basis - d * normal
    pts += rng.normal(scale=noise, size=pts.shape).astype(np.float32)
    return pts.astype(np.float32), normal


def with_outliers(rng, pts, n_out=100, lo=-3, hi=3):
    out = rng.uniform(lo, hi, size=(n_out, 3)).astype(np.float32)
    allp = np.concatenate([pts, out])
    return allp, np.arange(len(allp)) < len(pts)


class TestPlane:
    def test_fit_with_outliers(self, rng):
        pts, n_true = make_plane(rng)
        allp, inlier_true = with_outliers(rng, pts)
        res = sac.ransac(
            sac.PlaneModel(), jnp.asarray(allp), jnp.ones(len(allp), bool),
            threshold=0.02, key=_key(1), n_hypotheses=256,
        )
        assert bool(res.valid)
        c = np.asarray(res.coefficients)
        n_est = c[:3] * np.sign(c[:3] @ n_true)
        assert n_est @ n_true > 0.999
        inl = np.asarray(res.inliers)
        assert inl[inlier_true].mean() > 0.95
        assert inl[~inlier_true].mean() < 0.1

    @pytest.mark.parametrize("method", ["msac", "lmeds", "mlesac", "rransac"])
    def test_methods(self, rng, method):
        pts, n_true = make_plane(rng)
        allp, _ = with_outliers(rng, pts, n_out=60)
        res = sac.ransac(
            sac.PlaneModel(), jnp.asarray(allp), jnp.ones(len(allp), bool),
            threshold=0.02, key=_key(2), n_hypotheses=256, method=method,
        )
        c = np.asarray(res.coefficients)
        assert abs(c[:3] @ n_true) > 0.99

    def test_projection(self, rng):
        pts, n_true = make_plane(rng, noise=0.02)
        model = sac.PlaneModel()
        res = sac.ransac(model, jnp.asarray(pts), jnp.ones(len(pts), bool),
                         threshold=0.05, key=_key(3))
        proj = np.asarray(model.project(res.coefficients[None], jnp.asarray(pts)))[0]
        c = np.asarray(res.coefficients)
        resid = proj @ c[:3] + c[3]
        assert np.abs(resid).max() < 1e-5


class TestSphere:
    def test_fit(self, rng):
        center = np.array([0.5, -0.3, 1.2], np.float32)
        r = 0.8
        d = rng.normal(size=(400, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pts = center + r * d + rng.normal(scale=0.003, size=(400, 3)).astype(np.float32)
        allp, _ = with_outliers(rng, pts, n_out=80)
        res = sac.ransac(sac.SphereModel(), jnp.asarray(allp),
                         jnp.ones(len(allp), bool), threshold=0.02,
                         key=_key(4), n_hypotheses=512)
        c = np.asarray(res.coefficients)
        assert bool(res.valid)
        np.testing.assert_allclose(c[:3], center, atol=0.02)
        assert abs(c[3] - r) < 0.02


class TestLine:
    def test_fit(self, rng):
        p0 = np.array([1.0, 2.0, 3.0], np.float32)
        dvec = np.array([1.0, 1.0, 0.0], np.float32) / np.sqrt(2)
        t = rng.uniform(-2, 2, size=(200, 1)).astype(np.float32)
        pts = p0 + t * dvec + rng.normal(scale=0.005, size=(200, 3)).astype(np.float32)
        allp, _ = with_outliers(rng, pts, n_out=50)
        res = sac.ransac(sac.LineModel(), jnp.asarray(allp),
                         jnp.ones(len(allp), bool), threshold=0.02, key=_key(5))
        c = np.asarray(res.coefficients)
        assert abs(c[3:6] @ dvec) > 0.999


class TestCylinder:
    def test_fit(self, rng):
        axis_p = np.zeros(3, np.float32)
        axis_d = np.array([0.0, 0.0, 1.0], np.float32)
        r = 0.5
        theta = rng.uniform(0, 2 * np.pi, size=300).astype(np.float32)
        z = rng.uniform(-1, 1, size=300).astype(np.float32)
        pts = np.stack([r * np.cos(theta), r * np.sin(theta), z], 1)
        normals = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], 1)
        res = sac.ransac(
            sac.CylinderModel(), jnp.asarray(pts), jnp.ones(len(pts), bool),
            threshold=0.02, key=_key(6), normals=jnp.asarray(normals),
            n_hypotheses=512, refine=False,
        )
        c = np.asarray(res.coefficients)
        assert bool(res.valid)
        assert abs(c[3:6] @ axis_d) > 0.99
        assert abs(c[6] - r) < 0.03


class TestCircle3D:
    def test_fit(self, rng):
        center = np.array([1.0, 0.0, 2.0], np.float32)
        r = 1.5
        theta = rng.uniform(0, 2 * np.pi, size=200).astype(np.float32)
        pts = center + np.stack(
            [r * np.cos(theta), r * np.sin(theta), np.zeros_like(theta)], 1)
        res = sac.ransac(sac.CircleModel3D(), jnp.asarray(pts),
                         jnp.ones(len(pts), bool), threshold=0.01,
                         key=_key(7), refine=False)
        c = np.asarray(res.coefficients)
        np.testing.assert_allclose(c[:3], center, atol=0.02)
        assert abs(c[3] - r) < 0.02
        assert abs(c[4:7] @ np.array([0, 0, 1.0])) > 0.999


class TestRegistrationModel:
    def test_rejects_outlier_correspondences(self, rng):
        src = rng.normal(size=(200, 3)).astype(np.float32)
        from pcl_tpu.core import transforms as tf
        T = np.asarray(tf.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.2, -0.3, 0.1], jnp.float32)))
        dst = src @ T[:3, :3].T + T[:3, 3]
        # corrupt 30% of correspondences
        bad = rng.random(200) < 0.3
        dst_c = dst.copy()
        dst_c[bad] += rng.uniform(0.5, 2.0, size=(bad.sum(), 3)).astype(np.float32)
        res = sac.ransac(
            sac.RegistrationModel(), jnp.asarray(src), jnp.ones(200, bool),
            threshold=0.05, key=_key(8), target_xyz=jnp.asarray(dst_c),
            n_hypotheses=512,
        )
        T_est = np.asarray(res.coefficients).reshape(4, 4)
        np.testing.assert_allclose(T_est, T, atol=5e-3)
        inl = np.asarray(res.inliers)
        assert inl[~bad].mean() > 0.95
        assert inl[bad].mean() < 0.1
