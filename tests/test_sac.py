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


class TestCircle2D:
    def test_fit(self, rng):
        center = np.array([0.5, -1.0], np.float32)
        r = 2.0
        theta = rng.uniform(0, 2 * np.pi, size=200).astype(np.float32)
        pts = np.stack([center[0] + r * np.cos(theta),
                        center[1] + r * np.sin(theta),
                        rng.uniform(-1, 1, 200).astype(np.float32)], 1)
        res = sac.ransac(sac.Circle2DModel(), jnp.asarray(pts),
                         jnp.ones(len(pts), bool), threshold=0.01,
                         key=_key(9), refine=True)
        c = np.asarray(res.coefficients)
        assert bool(res.valid)
        np.testing.assert_allclose(c[:2], center, atol=0.02)
        assert abs(c[2] - r) < 0.02


class TestCone:
    def test_fit(self, rng):
        apex = np.array([0.0, 0.0, 1.0], np.float32)
        axis = np.array([0.0, 0.0, -1.0], np.float32)
        alpha = 0.35
        h = rng.uniform(0.2, 1.5, size=400).astype(np.float32)
        theta = rng.uniform(0, 2 * np.pi, size=400).astype(np.float32)
        rho = h * np.tan(alpha)
        pts = apex + np.stack([rho * np.cos(theta), rho * np.sin(theta), -h], 1)
        # outward surface normals: radial*cos(alpha) + axis-opposed*sin...
        rad = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], 1)
        normals = (rad * np.cos(alpha) - axis[None, :] * np.sin(alpha)).astype(np.float32)
        res = sac.ransac(
            sac.ConeModel(), jnp.asarray(pts.astype(np.float32)),
            jnp.ones(len(pts), bool), threshold=0.01, key=_key(10),
            normals=jnp.asarray(normals), n_hypotheses=512, refine=False,
        )
        c = np.asarray(res.coefficients)
        assert bool(res.valid)
        np.testing.assert_allclose(c[:3], apex, atol=0.03)
        assert c[3:6] @ axis > 0.99
        assert abs(c[6] - alpha) < 0.03
        assert int(res.num_inliers) > 350


class TestTorus:
    def test_fit(self, rng):
        R, r = 1.0, 0.25
        center = np.array([0.0, 0.5, 0.0], np.float32)
        u = rng.uniform(0, 2 * np.pi, size=500).astype(np.float32)
        v = rng.uniform(0, 2 * np.pi, size=500).astype(np.float32)
        ring = np.stack([np.cos(u), np.sin(u), np.zeros_like(u)], 1)
        nrm = ring * np.cos(v)[:, None]
        nrm[:, 2] = np.sin(v)
        pts = center + ring * R + nrm * r
        res = sac.ransac(
            sac.TorusModel(), jnp.asarray(pts.astype(np.float32)),
            jnp.ones(len(pts), bool), threshold=0.02, key=_key(11),
            normals=jnp.asarray(nrm.astype(np.float32)),
            n_hypotheses=1024, refine=False,
        )
        c = np.asarray(res.coefficients)
        assert bool(res.valid)
        assert abs(c[0] - R) < 0.05
        assert abs(c[1] - r) < 0.05
        np.testing.assert_allclose(c[2:5], center, atol=0.05)
        assert abs(c[5:8] @ np.array([0, 0, 1.0])) > 0.99
        assert int(res.num_inliers) > 400


class TestEllipse3D:
    def test_fit(self, rng):
        a, b = 2.0, 1.0
        center = np.array([1.0, 2.0, 3.0], np.float32)
        t = rng.uniform(0, 2 * np.pi, size=300).astype(np.float32)
        pts = center + np.stack([a * np.cos(t), b * np.sin(t), np.zeros_like(t)], 1)
        res = sac.ransac(
            sac.Ellipse3DModel(), jnp.asarray(pts.astype(np.float32)),
            jnp.ones(len(pts), bool), threshold=0.02, key=_key(12),
            n_hypotheses=512, refine=False,
        )
        c = np.asarray(res.coefficients)
        assert bool(res.valid)
        np.testing.assert_allclose(c[:3], center, atol=0.05)
        assert abs(c[3] - a) < 0.1
        assert abs(c[4] - b) < 0.1
        assert abs(c[5:8] @ np.array([0, 0, 1.0])) > 0.99
        assert int(res.num_inliers) > 250


class TestConstrainedModels:
    def test_perpendicular_plane_rejects_wrong_orientation(self, rng):
        # vertical plane (normal along x), but we require normal ~ z
        pts, _ = make_plane(rng, normal=(1, 0, 0), d=0.0)
        res = sac.ransac(
            sac.PerpendicularPlaneModel(axis=(0.0, 0.0, 1.0), eps_angle=0.1),
            jnp.asarray(pts), jnp.ones(len(pts), bool), threshold=0.02,
            key=_key(13), n_hypotheses=256,
        )
        assert not bool(res.valid)

    def test_parallel_plane_accepts(self, rng):
        # plane normal along x is PARALLEL to z axis -> accepted
        pts, n_true = make_plane(rng, normal=(1, 0, 0), d=0.0)
        res = sac.ransac(
            sac.ParallelPlaneModel(axis=(0.0, 0.0, 1.0), eps_angle=0.1),
            jnp.asarray(pts), jnp.ones(len(pts), bool), threshold=0.02,
            key=_key(14), n_hypotheses=256,
        )
        assert bool(res.valid)
        c = np.asarray(res.coefficients)
        assert abs(c[:3] @ n_true) > 0.99

    def test_parallel_line(self, rng):
        t = rng.uniform(-1, 1, size=200).astype(np.float32)
        pts = np.stack([np.zeros_like(t), np.zeros_like(t), t], 1)
        pts += rng.normal(scale=0.002, size=pts.shape).astype(np.float32)
        res = sac.ransac(
            sac.ParallelLineModel(axis=(0.0, 0.0, 1.0), eps_angle=0.1),
            jnp.asarray(pts), jnp.ones(len(pts), bool), threshold=0.02,
            key=_key(15), n_hypotheses=256, refine=False,
        )
        assert bool(res.valid)
        c = np.asarray(res.coefficients)
        assert abs(c[3:6] @ np.array([0, 0, 1.0])) > 0.995

    def test_normal_plane_scoring(self, rng):
        pts, n_true = make_plane(rng, normal=(0, 0, 1), d=-0.5)
        allp, inlier_true = with_outliers(rng, pts)
        normals = np.tile(n_true, (len(allp), 1)).astype(np.float32)
        res = sac.ransac(
            sac.NormalPlaneModel(normal_distance_weight=0.2),
            jnp.asarray(allp), jnp.ones(len(allp), bool), threshold=0.05,
            key=_key(16), normals=jnp.asarray(normals), n_hypotheses=256,
        )
        assert bool(res.valid)
        c = np.asarray(res.coefficients)
        assert abs(c[:3] @ n_true) > 0.99


class TestEstimatorVariants:
    def _sphere(self, rng, n=300, center=(0, 1, 2), r=1.0):
        c = np.asarray(center, np.float32)
        v = rng.normal(size=(n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return c + r * v

    @pytest.mark.parametrize("method", ["rmsac", "mlesac", "rransac"])
    def test_methods_recover_sphere(self, rng, method):
        pts = self._sphere(rng)
        allp, _ = with_outliers(rng, pts)
        res = sac.ransac(
            sac.SphereModel(), jnp.asarray(allp), jnp.ones(len(allp), bool),
            threshold=0.03, key=_key(17), n_hypotheses=512, method=method,
        )
        c = np.asarray(res.coefficients)
        assert bool(res.valid)
        np.testing.assert_allclose(c[:3], [0, 1, 2], atol=0.05)
        assert abs(c[3] - 1.0) < 0.05

    def test_prosac_quality_sampling(self, rng):
        pts, n_true = make_plane(rng)
        allp, inlier_true = with_outliers(rng, pts)
        # quality: true inliers ranked best (as if from a matcher score)
        quality = inlier_true.astype(np.float32) + rng.random(len(allp)).astype(np.float32) * 0.1
        res = sac.ransac(
            sac.PlaneModel(), jnp.asarray(allp), jnp.ones(len(allp), bool),
            threshold=0.02, key=_key(18), n_hypotheses=128,
            quality=jnp.asarray(quality),
        )
        assert bool(res.valid)
        c = np.asarray(res.coefficients)
        assert abs(c[:3] @ n_true) > 0.99
