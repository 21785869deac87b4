"""Keypoint tests — corners of a box should out-salient flat faces."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu import features
from pcl_tpu.keypoints import iss3d_keypoints, harris3d_keypoints


def box_cloud(rng, n_face=300, size=1.0):
    """Points on 3 faces of a cube meeting at the corner (0,0,0)."""
    u = rng.uniform(0, size, size=(n_face, 2)).astype(np.float32)
    z = np.zeros((n_face, 1), np.float32)
    fx = np.concatenate([z, u], 1)               # x=0 face
    fy = np.concatenate([u[:, :1], z, u[:, 1:]], 1)
    fz = np.concatenate([u, z], 1)
    pts = np.concatenate([fx, fy, fz])
    return pts + rng.normal(scale=0.002, size=pts.shape).astype(np.float32)


class TestISS:
    def test_corner_saliency(self, rng):
        pts = box_cloud(rng)
        c = make_cloud(jnp.asarray(pts))
        kp, sal = iss3d_keypoints(c, salient_radius=0.3, non_max_radius=0.2,
                                  gamma_21=0.9, gamma_32=0.9)
        kp = np.asarray(kp); sal = np.asarray(sal)
        assert kp.any()
        # keypoints concentrate near edges/corner, not in face interiors
        d_corner = np.linalg.norm(pts, axis=1)
        interior = (pts > 0.35).sum(1) >= 2          # away from all edges
        assert kp[interior].mean() < 0.02
        # NMS: no two keypoints within non_max_radius
        kpts = pts[kp]
        if len(kpts) > 1:
            dd = np.linalg.norm(kpts[:, None] - kpts[None], axis=-1)
            np.fill_diagonal(dd, 1e9)
            assert dd.min() > 0.19

    def test_flat_plane_interior_no_keypoints(self, rng):
        # border points have anisotropic neighborhoods and legitimately pass
        # the ratio tests (the reference behaves the same); the INTERIOR of
        # a plane must stay keypoint-free
        u = rng.uniform(0, 2, size=(800, 2)).astype(np.float32)
        pts = np.concatenate([u, np.zeros((800, 1), np.float32)], 1)
        c = make_cloud(jnp.asarray(pts))
        kp, _ = iss3d_keypoints(c, salient_radius=0.3, non_max_radius=0.2,
                                gamma_21=0.6, gamma_32=0.6)
        interior = ((u > 0.4) & (u < 1.6)).all(axis=1)
        assert np.asarray(kp)[interior].mean() < 0.02


class TestHarris:
    def test_corner_response(self, rng):
        pts = box_cloud(rng)
        c = make_cloud(jnp.asarray(pts))
        c = features.estimate_normals(c, k=12, viewpoint=jnp.asarray([2.0, 2.0, 2.0]))
        kp, resp = harris3d_keypoints(c, radius=0.25, threshold=1e-4)
        kp = np.asarray(kp); resp = np.asarray(resp)
        assert kp.any()
        interior = (pts > 0.4).sum(1) >= 2
        edge = (pts < 0.15).sum(1) >= 2              # near an edge or corner
        assert resp[edge].mean() > resp[interior].mean() * 5

    @pytest.mark.parametrize("response", ["noble", "tomasi", "lowe"])
    def test_response_variants_run(self, rng, response):
        pts = box_cloud(rng, n_face=150)
        c = make_cloud(jnp.asarray(pts))
        c = features.estimate_normals(c, k=10)
        kp, resp = harris3d_keypoints(c, radius=0.25, response=response)
        assert np.isfinite(np.asarray(resp)).all()


class TestSIFT:
    def test_bump_detected(self, rng):
        from pcl_tpu.keypoints import sift_keypoints
        # flat plane with a Gaussian bump in z: the bump center is a
        # scale-space extremum of the z field
        u = rng.uniform(-1, 1, size=(1500, 2)).astype(np.float32)
        z = 0.3 * np.exp(-((u[:, 0] - 0.2) ** 2 + (u[:, 1] + 0.1) ** 2) / 0.02)
        pts = np.stack([u[:, 0], u[:, 1], z], 1).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        kp, scale = sift_keypoints(c, min_scale=0.05, n_octaves=2,
                                   min_contrast=0.01)
        kp = np.asarray(kp)
        assert kp.any()
        d_bump = np.linalg.norm(u - [0.2, -0.1], axis=1)
        # at least one keypoint near the bump
        assert d_bump[kp].min() < 0.15


class TestSUSAN:
    def test_corner_detected(self, rng):
        from pcl_tpu.keypoints import susan_keypoints
        pts = box_cloud(rng)
        c = make_cloud(jnp.asarray(pts))
        c = features.estimate_normals(c, k=12, viewpoint=jnp.asarray([2.0, 2, 2]))
        kp, resp = susan_keypoints(c, radius=0.25)
        kp = np.asarray(kp)
        assert kp.any()
        interior = (pts > 0.4).sum(1) >= 2
        assert kp[interior].mean() < 0.02
