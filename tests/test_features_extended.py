"""Tests for SHOT, VFH, ESF, principal curvatures, boundary, spin images,
DoN, moment of inertia."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud
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
