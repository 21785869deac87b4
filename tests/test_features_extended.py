"""Tests for SHOT, VFH, ESF, principal curvatures, boundary, spin images,
DoN, moment of inertia."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud, Cloud
from pcl_tpu.core import transforms as tf
from pcl_tpu import features


def curved_scene(rng, n=600):
    t = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    z = 0.4 * np.sin(2 * t[:, 0]) * np.cos(2 * t[:, 1])
    pts = np.stack([t[:, 0], t[:, 1], z], 1).astype(np.float32)
    return pts + rng.normal(scale=0.003, size=pts.shape).astype(np.float32)


def _with_normals(pts, k=12):
    c = make_cloud(jnp.asarray(pts))
    return features.estimate_normals(c, k=k, viewpoint=jnp.asarray([0.0, 0, 100.0]))


class TestSHOT:
    def test_shape_and_norm(self, rng):
        c = _with_normals(curved_scene(rng))
        d = np.asarray(features.estimate_shot(c, radius=0.3))
        assert d.shape[1] == 352
        norms = np.linalg.norm(d, axis=1)
        nz = norms > 0
        np.testing.assert_allclose(norms[nz], 1.0, atol=1e-4)

    def test_rigid_invariance(self, rng):
        pts = curved_scene(rng, n=400)
        c = _with_normals(pts)
        d0 = np.asarray(features.estimate_shot(c, radius=0.3))
        T = tf.se3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.3, -0.2, 0.5], jnp.float32))
        c_t = tf.transform_cloud(T, c)
        d1 = np.asarray(features.estimate_shot(c_t, radius=0.3))
        l1 = np.abs(d0 - d1).sum(axis=1)
        # L2-normalized histograms: max possible L1 distance ~ 2*sqrt(352);
        # median should be small (bin jitter only)
        assert np.median(l1) < 0.5


class TestVFH:
    def test_shape_and_mass(self, rng):
        c = _with_normals(curved_scene(rng))
        v = np.asarray(features.estimate_vfh(c))
        assert v.shape == (308,)
        # angle blocks sum to ~100 each
        for b in range(4):
            assert abs(v[b * 45:(b + 1) * 45].sum() - 100.0) < 1.0
        assert abs(v[180:].sum() - 100.0) < 1.0

    def test_distinguishes_shapes(self, rng):
        a = _with_normals(curved_scene(rng))
        sph = rng.normal(size=(600, 3)).astype(np.float32)
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        b = _with_normals(sph)
        va = np.asarray(features.estimate_vfh(a))
        vb = np.asarray(features.estimate_vfh(b))
        assert np.abs(va - vb).sum() > 20.0


class TestESF:
    def test_shape(self, rng):
        c = make_cloud(jnp.asarray(curved_scene(rng)))
        e = np.asarray(features.estimate_esf(c, key=jax.random.PRNGKey(0)))
        assert e.shape == (640,)
        assert np.isfinite(e).all() and e.sum() > 0

    def test_scale_invariance(self, rng):
        pts = curved_scene(rng)
        c1 = make_cloud(jnp.asarray(pts))
        c2 = make_cloud(jnp.asarray(pts * 5.0))
        e1 = np.asarray(features.estimate_esf(c1, key=jax.random.PRNGKey(1)))
        e2 = np.asarray(features.estimate_esf(c2, key=jax.random.PRNGKey(1)))
        np.testing.assert_allclose(e1, e2, atol=5.0)


class TestLocalMisc:
    def test_principal_curvatures_plane_vs_sphere(self, rng):
        flat = np.concatenate([rng.uniform(-1, 1, size=(400, 2)).astype(np.float32),
                               np.zeros((400, 1), np.float32)], 1)
        cf = _with_normals(flat)
        pc1_f, _, _ = features.principal_curvatures(cf, k=12)
        sph = rng.normal(size=(400, 3)).astype(np.float32)
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        cs = _with_normals(sph)
        pc1_s, _, _ = features.principal_curvatures(cs, k=12)
        assert float(jnp.mean(pc1_s)) > 5 * float(jnp.mean(pc1_f))

    def test_boundary_on_plane_patch(self, rng):
        u = rng.uniform(0, 1, size=(800, 2)).astype(np.float32)
        pts = np.concatenate([u, np.zeros((800, 1), np.float32)], 1)
        c = _with_normals(pts)
        b = np.asarray(features.boundary_estimation(c, radius=0.15))
        edge = ((u < 0.05) | (u > 0.95)).any(axis=1)
        interior = ((u > 0.2) & (u < 0.8)).all(axis=1)
        assert b[edge].mean() > 0.6
        assert b[interior].mean() < 0.05

    def test_spin_images(self, rng):
        c = _with_normals(curved_scene(rng))
        s = np.asarray(features.spin_images(c, radius=0.3))
        assert s.shape[1] == 153
        nz = s.sum(axis=1) > 0
        np.testing.assert_allclose(s[nz].sum(axis=1), 1.0, atol=1e-4)

    def test_don_flags_fine_detail(self, rng):
        # flat plane with a rough patch: small-scale normals disagree with
        # large-scale ones only in the rough region
        u = rng.uniform(-1, 1, size=(600, 2)).astype(np.float32)
        base = np.concatenate([u, np.zeros((600, 1), np.float32)], 1)
        noisy = base.copy()
        rough = u[:, 0] < -0.5                 # spatially separated patch
        noisy[rough, 2] += rng.normal(scale=0.05, size=rough.sum()).astype(np.float32)
        far_flat = u[:, 0] > 0.0
        c = make_cloud(jnp.asarray(noisy))
        don = np.asarray(features.difference_of_normals(c, k_small=6, k_large=24))
        assert don[rough].mean() > 3 * don[far_flat].mean()

    def test_moment_of_inertia_obb(self, rng):
        # axis-aligned box with known extents, rotated
        pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
        pts[:, 1] *= 0.5
        pts[:, 2] *= 0.25
        R = np.asarray(tf.so3_exp(jnp.asarray([0.3, 0.2, 0.5], jnp.float32)))
        rot = (pts @ R.T).astype(np.float32)
        c = make_cloud(jnp.asarray(rot))
        res = features.moment_of_inertia(c)
        ext = np.sort(np.asarray(res.obb_extents))
        np.testing.assert_allclose(ext, [0.25, 0.5, 1.0], atol=0.05)
        # OBB axes recover the box axes up to sign/order
        V = np.asarray(res.obb_rotation)
        overlap = np.abs(V.T @ R)
        assert ((overlap > 0.97).sum(axis=1) == 1).all()


class TestRSD:
    def test_plane_vs_sphere_radii(self, rng):
        from pcl_tpu.features.rsd import estimate_rsd
        from pcl_tpu.features import estimate_normals
        # plane: large radii (clamped to plane_radius); sphere r=0.05: small
        n = 400
        uv = rng.uniform(-0.5, 0.5, size=(n, 2)).astype(np.float32)
        # plane below the viewpoint so normal orientation is consistent
        plane = np.concatenate([uv, np.full((n, 1), -0.5, np.float32)], 1)
        v = rng.normal(size=(n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        sphere = (np.float32([3, 0, 0]) + 0.05 * v).astype(np.float32)
        c = Cloud(xyz=jnp.asarray(np.concatenate([plane, sphere])),
                  mask=jnp.ones(2 * n, bool))
        c = estimate_normals(c, k=12)
        r_min, r_max = estimate_rsd(c, radius=0.08, plane_radius=0.2, k=24)
        r_min = np.asarray(r_min)
        r_max = np.asarray(r_max)
        assert np.median(r_min[:n]) > 0.15          # flat -> clamped large
        # sphere: radii near 0.05, clearly below the plane clamp (r_min is
        # min-biased by normal estimation noise; r_max is the stable bound)
        assert np.median(r_min[n:]) < 0.1
        assert 0.02 < np.median(r_max[n:]) < 0.12

    def test_grsd_distinguishes_shapes(self, rng):
        from pcl_tpu.features.rsd import estimate_grsd
        from pcl_tpu.features import estimate_normals
        n = 400
        uv = rng.uniform(-0.5, 0.5, size=(n, 2)).astype(np.float32)
        plane = np.concatenate([uv, np.full((n, 1), -0.5, np.float32)], 1)
        v = rng.normal(size=(n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        sphere = (0.05 * v).astype(np.float32)
        c1 = estimate_normals(Cloud(xyz=jnp.asarray(plane), mask=jnp.ones(n, bool)), k=12)
        c2 = estimate_normals(Cloud(xyz=jnp.asarray(sphere), mask=jnp.ones(n, bool)), k=12)
        h1 = np.asarray(estimate_grsd(c1, radius=0.08))
        h2 = np.asarray(estimate_grsd(c2, radius=0.02))
        assert abs(h1.sum() - 1) < 1e-5 and abs(h2.sum() - 1) < 1e-5
        assert np.abs(h1 - h2).sum() > 0.5          # clearly different


class TestMomentInvariants:
    def test_rotation_invariance(self, rng):
        from pcl_tpu.features import moment_invariants
        from pcl_tpu.core.transforms import se3_exp
        pts = rng.normal(size=(300, 3)).astype(np.float32) * np.float32([1, 0.5, 0.2])
        T = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0.4, -0.3, 0.6], jnp.float32)))
        pts_r = pts @ T[:3, :3].T
        m1 = np.asarray(moment_invariants(
            Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(300, bool)), radius=0.5))
        m2 = np.asarray(moment_invariants(
            Cloud(xyz=jnp.asarray(pts_r.astype(np.float32)), mask=jnp.ones(300, bool)), radius=0.5))
        # invariants are rotation-invariant per point
        np.testing.assert_allclose(m1, m2, rtol=0.05, atol=1e-4)


class TestIntensityFamily:
    def _textured_plane(self, rng, n=500):
        uv = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        pts = np.concatenate([uv, np.zeros((n, 1), np.float32)], 1)
        inten = (2.0 * uv[:, 0]).astype(np.float32)   # gradient along +x
        normals = np.tile(np.float32([0, 0, 1]), (n, 1))
        from pcl_tpu.core.cloud import ATTR_NORMAL, ATTR_INTENSITY
        return Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(n, bool),
                     attrs={ATTR_NORMAL: jnp.asarray(normals),
                            ATTR_INTENSITY: jnp.asarray(inten)})

    def test_gradient_direction(self, rng):
        from pcl_tpu.features import intensity_gradient
        c = self._textured_plane(rng)
        g = np.asarray(intensity_gradient(c, radius=0.3, k=24))
        gm = g[np.linalg.norm(g, axis=1) > 0.1]
        u = gm / np.linalg.norm(gm, axis=1, keepdims=True)
        assert np.median(u[:, 0]) > 0.95              # points along +x
        assert abs(np.median(u[:, 2])) < 0.05         # in tangent plane
        assert abs(np.median(np.linalg.norm(gm, axis=1)) - 2.0) < 0.3

    def test_intensity_spin_normalized(self, rng):
        from pcl_tpu.features import intensity_spin
        c = self._textured_plane(rng)
        h = np.asarray(intensity_spin(c, radius=0.3, k=24))
        assert h.shape == (500, 20)
        np.testing.assert_allclose(h.sum(1), 1.0, atol=1e-4)

    def test_rift_rotation_invariance(self, rng):
        from pcl_tpu.features import intensity_gradient, rift
        c = self._textured_plane(rng)
        g = intensity_gradient(c, radius=0.3, k=24)
        h = np.asarray(rift(c, radius=0.3, gradients=g, k=24))
        assert h.shape == (500, 32)
        # rotate the plane about z: descriptor should be ~unchanged
        th = 0.8
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
        xyz_r = np.asarray(c.xyz) @ R.T
        from pcl_tpu.core.cloud import ATTR_NORMAL, ATTR_INTENSITY
        c2 = Cloud(xyz=jnp.asarray(xyz_r), mask=c.mask,
                   attrs={ATTR_NORMAL: c.attrs[ATTR_NORMAL],
                          ATTR_INTENSITY: c.attrs[ATTR_INTENSITY]})
        g2 = intensity_gradient(c2, radius=0.3, k=24)
        h2 = np.asarray(rift(c2, radius=0.3, gradients=g2, k=24))
        valid = h.sum(1) > 0
        assert np.abs(h[valid] - h2[valid]).max() < 0.15
