"""Mesh-based RoPS on the reference's own fixture.

Mirrors reference test/features/test_rops_estimation.cpp (ROPSFeature,
FeatureExtraction): rops_cloud.pcd + rops_indices.txt + rops_triangles.txt
with support_radius 0.0285, 5 partition bins, 3 rotations -> Histogram<135>
per keypoint. The reference test asserts a non-empty output; we addition-
ally pin the L1 normalization, finiteness, cap integrity, and the
rotation covariance the descriptor is designed for.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import reference_pcd
from pcl_tpu.io import pcd as pcd_io
from pcl_tpu.features import estimate_rops_mesh


@pytest.fixture(scope="module")
def fixture():
    c = pcd_io.load(reference_pcd("rops_cloud.pcd"))
    xyz = np.asarray(c.xyz)[np.asarray(c.mask)]
    idx = np.loadtxt(reference_pcd("rops_indices.txt"), dtype=np.int64)
    tri = np.loadtxt(reference_pcd("rops_triangles.txt"), dtype=np.int64)
    return xyz, tri, idx


def test_rops_feature_extraction(fixture):
    xyz, tri, idx = fixture
    feats, lrfs, overflow = estimate_rops_mesh(
        xyz, tri, idx, support_radius=0.0285,
        n_rotations=3, n_bins=5, cap_pts=640, cap_tri=2048)
    feats = np.asarray(feats)
    assert feats.shape == (len(idx), 135)
    assert not np.asarray(overflow).any(), "caps truncated a support region"
    assert np.isfinite(feats).all()
    # L1-normalized output (rops_estimation.hpp:196)
    l1 = np.abs(feats).sum(axis=1)
    np.testing.assert_allclose(l1, 1.0, atol=1e-4)
    # LRFs are right-handed orthonormal row frames
    lrfs = np.asarray(lrfs)
    rtr = np.einsum("kij,klj->kil", lrfs, lrfs)
    np.testing.assert_allclose(
        rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-3)
    dets = np.linalg.det(lrfs)
    np.testing.assert_allclose(dets, 1.0, atol=1e-3)
    # descriptors vary across the shape (not collapsed)
    assert feats.std(axis=0).max() > 1e-3


def test_rops_rotation_invariance(fixture):
    xyz, tri, idx = fixture
    sub = idx[:32]
    f0, _, ov0 = estimate_rops_mesh(
        xyz, tri, sub, support_radius=0.0285, cap_pts=640, cap_tri=2048,
        chunk=32)
    th = 0.7
    R = np.array([
        [np.cos(th), -np.sin(th), 0.0],
        [np.sin(th), np.cos(th), 0.0],
        [0.0, 0.0, 1.0]], np.float32) @ np.array([
            [1.0, 0.0, 0.0],
            [0.0, np.cos(0.4), -np.sin(0.4)],
            [0.0, np.sin(0.4), np.cos(0.4)]], np.float32)
    f1, _, ov1 = estimate_rops_mesh(
        xyz @ R.T + np.float32([0.3, -0.1, 0.2]), tri, sub,
        support_radius=0.0285, cap_pts=640, cap_tri=2048, chunk=32)
    assert not (np.asarray(ov0).any() or np.asarray(ov1).any())
    # rotation-invariant descriptor: same histograms in the rotated frame
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               atol=2e-3)
