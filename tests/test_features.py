"""Feature tests — normals against analytic surfaces, FPFH/PFH invariances
(the reference validates against golden histograms in test/features/; our
oracle is analytic geometry + rigid-invariance properties)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import make_cloud, ATTR_NORMAL, ATTR_CURVATURE
from pcl_tpu.core import transforms as tf
from pcl_tpu import features


def plane_cloud(rng, n=400, normal=(0.0, 0.0, 1.0), noise=0.0):
    normal = np.asarray(normal, np.float32)
    normal /= np.linalg.norm(normal)
    # orthonormal basis of the plane
    a = np.array([1.0, 0, 0], np.float32)
    if abs(normal[0]) > 0.9:
        a = np.array([0, 1.0, 0], np.float32)
    u = np.cross(normal, a); u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    uv = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    pts = uv[:, :1] * u + uv[:, 1:] * v
    if noise:
        pts = pts + rng.normal(scale=noise, size=(n, 3)).astype(np.float32)
    return pts.astype(np.float32), normal


class TestNormals:
    def test_plane_normals(self, rng):
        pts, n_true = plane_cloud(rng, normal=(0.3, -0.5, 0.8))
        cloud = make_cloud(jnp.asarray(pts))
        out = features.estimate_normals(cloud, k=12, viewpoint=jnp.asarray(n_true * 10.0))
        n = np.asarray(out.attrs[ATTR_NORMAL])
        dots = n @ n_true
        assert (dots > 0.999).all()
        c = np.asarray(out.attrs[ATTR_CURVATURE])
        assert (c < 1e-4).all()

    def test_viewpoint_flip(self, rng):
        pts, n_true = plane_cloud(rng)
        cloud = make_cloud(jnp.asarray(pts))
        up = features.estimate_normals(cloud, k=12, viewpoint=jnp.asarray([0.0, 0, 10]))
        dn = features.estimate_normals(cloud, k=12, viewpoint=jnp.asarray([0.0, 0, -10]))
        nu = np.asarray(up.attrs[ATTR_NORMAL])
        nd = np.asarray(dn.attrs[ATTR_NORMAL])
        np.testing.assert_allclose(nu, -nd, atol=1e-5)

    def test_sphere_curvature_positive(self, rng):
        # points on a unit sphere: normals radial, curvature > 0
        p = rng.normal(size=(500, 3)).astype(np.float32)
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        cloud = make_cloud(jnp.asarray(p))
        out = features.estimate_normals(cloud, k=10, viewpoint=jnp.zeros(3))
        n = np.asarray(out.attrs[ATTR_NORMAL])
        # radial direction (inward, toward viewpoint at origin)
        dots = np.abs(np.sum(n * p, axis=1))
        assert np.mean(dots > 0.95) > 0.95
        assert np.asarray(out.attrs[ATTR_CURVATURE]).mean() > 1e-4

    def test_masked_points_get_zero(self, rng):
        pts, _ = plane_cloud(rng, n=100)
        mask = np.ones(100, bool); mask[50:] = False
        cloud = make_cloud(jnp.asarray(pts), jnp.asarray(mask))
        out = features.estimate_normals(cloud, k=8)
        n = np.asarray(out.attrs[ATTR_NORMAL])
        assert np.all(n[50:] == 0)
        assert np.all(np.abs(np.linalg.norm(n[:50], axis=1) - 1.0) < 1e-4)


class TestFPFH:
    def _with_normals(self, pts, k=12):
        cloud = make_cloud(jnp.asarray(pts))
        return features.estimate_normals(cloud, k=k, viewpoint=jnp.asarray([0.0, 0, 100.0]))

    def test_blocks_sum_100(self, rng):
        pts, _ = plane_cloud(rng, noise=0.02)
        cloud = self._with_normals(pts)
        f = np.asarray(features.estimate_fpfh(cloud, k=12))
        for b in range(3):
            s = f[:, b * 11:(b + 1) * 11].sum(axis=1)
            np.testing.assert_allclose(s, 100.0, atol=1e-2)

    def test_rigid_invariance(self, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        cloud = self._with_normals(pts)
        f0 = np.asarray(features.estimate_fpfh(cloud, k=10))
        T = tf.se3_exp(jnp.asarray([0.1, -0.2, 0.3, 0.4, 0.5, -0.6], jnp.float32))
        # transform positions AND normals (descriptor invariance isolated
        # from normal re-estimation, whose viewpoint flips are not invariant)
        cloud_t = tf.transform_cloud(T, cloud)
        f1 = np.asarray(features.estimate_fpfh(cloud_t, k=10))
        # histograms are rigid-invariant up to binning jitter at bin edges
        l1 = np.abs(f0 - f1).sum(axis=1)
        assert np.median(l1) < 30.0  # out of 300 total mass

    def test_plane_alpha_phi_concentrated(self, rng):
        # flat plane: alpha = v.n2 = 0 -> middle bin of block 2;
        # phi = u.d/||d|| = 0 -> middle bin of block 3
        pts, _ = plane_cloud(rng)
        cloud = self._with_normals(pts)
        f = np.asarray(features.estimate_fpfh(cloud, k=12))
        mid = 5
        assert (f[:, 11 + mid] > 90).mean() > 0.9
        assert (f[:, 22 + mid] > 90).mean() > 0.9

    def test_pfh_sums_100(self, rng):
        pts = rng.normal(size=(150, 3)).astype(np.float32)
        cloud = self._with_normals(pts, k=8)
        h = np.asarray(features.estimate_pfh(cloud, k=8))
        np.testing.assert_allclose(h.sum(axis=1), 100.0, atol=1e-2)
        assert h.shape[1] == 125

    def test_pfh_distinguishes_plane_from_sphere(self, rng):
        pts_p, _ = plane_cloud(rng, n=200)
        sph = rng.normal(size=(200, 3)).astype(np.float32)
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        hp = np.asarray(features.estimate_pfh(self._with_normals(pts_p, k=8), k=8)).mean(0)
        hs = np.asarray(features.estimate_pfh(self._with_normals(sph, k=8), k=8)).mean(0)
        assert np.abs(hp - hs).sum() > 20.0


def test_shot_color_shape_and_invariance(rng):
    """SHOT1344: shape + CIELab color histograms, rigid-motion invariant."""
    import jax.numpy as jnp
    from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_RGB
    from pcl_tpu.features import estimate_normals, estimate_shot_color

    xyz = rng.uniform(-0.5, 0.5, size=(300, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    c = Cloud(xyz=jnp.asarray(xyz), mask=jnp.ones((300,), bool))
    c = estimate_normals(c, k=12).with_attrs(rgb=jnp.asarray(rgb))
    d = estimate_shot_color(c, radius=0.3, k=32)
    assert d.shape == (300, 1344)
    norms = np.linalg.norm(np.asarray(d), axis=1)
    ok = norms > 0
    assert ok.mean() > 0.9
    np.testing.assert_allclose(norms[ok], 1.0, atol=1e-5)

    # rigid motion: rotate cloud, descriptors stay close
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    c2 = Cloud(xyz=jnp.asarray(xyz @ R.T), mask=jnp.ones((300,), bool))
    c2 = estimate_normals(c2, k=12).with_attrs(rgb=jnp.asarray(rgb))
    d2 = estimate_shot_color(c2, radius=0.3, k=32)
    both = ok & (np.linalg.norm(np.asarray(d2), axis=1) > 0)
    cs = np.einsum("nd,nd->n", np.asarray(d)[both], np.asarray(d2)[both])
    assert np.median(cs) > 0.8
