"""Tests for ICP variants, extra estimators, validation, pyramid matching
(mirrors reference test/registration/test_registration.cpp style: synthetic
rigid motions recovered to tight tolerances)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core.transforms import se3_exp
from pcl_tpu.registration import (
    estimate_dual_quaternion, estimate_2d, estimate_3point, estimate_lm,
    icp_nl, joint_icp, validate_euclidean, build_pyramid, compare_pyramids,
)
from pcl_tpu.registration.fpcs import kfpcs_align


def _rigid(rng, n=200, xi=(0.1, -0.2, 0.3, 0.2, 0.1, -0.15)):
    src = rng.normal(size=(n, 3)).astype(np.float32)
    T = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32)))
    dst = src @ T[:3, :3].T + T[:3, 3]
    return src, dst, T


class TestEstimators:
    def test_dual_quaternion(self, rng):
        src, dst, T = _rigid(rng)
        w = jnp.ones(len(src))
        T_est = np.asarray(estimate_dual_quaternion(jnp.asarray(src), jnp.asarray(dst), w))
        np.testing.assert_allclose(T_est, T, atol=1e-5)

    def test_dual_quaternion_weighted(self, rng):
        src, dst, T = _rigid(rng)
        dst2 = dst.copy()
        dst2[:40] += 3.0  # outliers zero-weighted
        w = jnp.asarray((np.arange(len(src)) >= 40).astype(np.float32))
        T_est = np.asarray(estimate_dual_quaternion(jnp.asarray(src), jnp.asarray(dst2), w))
        np.testing.assert_allclose(T_est, T, atol=1e-5)

    def test_2d(self, rng):
        th = 0.4
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
        src = rng.normal(size=(150, 3)).astype(np.float32)
        dst = src @ R.T + np.float32([0.3, -0.1, 0.0])
        T = np.asarray(estimate_2d(jnp.asarray(src), jnp.asarray(dst), jnp.ones(150)))
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)
        np.testing.assert_allclose(T[:2, 3], [0.3, -0.1], atol=1e-5)

    def test_3point(self, rng):
        src, dst, T = _rigid(rng, n=3)
        T_est = np.asarray(estimate_3point(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(T_est, T, atol=1e-4)

    def test_lm_rigid(self, rng):
        src, dst, T = _rigid(rng)
        T_est = np.asarray(estimate_lm(jnp.asarray(src), jnp.asarray(dst),
                                       jnp.ones(len(src)), iterations=25))
        np.testing.assert_allclose(T_est, T, atol=1e-4)


class TestICPVariants:
    def test_icp_nl_recovers_offset(self, rng):
        tgt = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        src = tgt + np.float32([0.05, -0.02, 0.03])
        res = icp_nl(
            Cloud(xyz=jnp.asarray(src), mask=jnp.ones(500, bool)),
            Cloud(xyz=jnp.asarray(tgt), mask=jnp.ones(500, bool)),
            max_corr_dist=0.3, max_iterations=30,
        )
        assert bool(res.converged)
        T = np.asarray(res.transform)
        np.testing.assert_allclose(T[:3, 3], [-0.05, 0.02, -0.03], atol=2e-3)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=2e-3)

    def test_joint_icp_shared_transform(self, rng):
        # two pairs observing the SAME motion from different point sets
        xi = (0.02, -0.01, 0.015, 0.02, -0.01, 0.03)
        T_true = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32)))
        clouds = []
        for seed in (1, 2):
            r2 = np.random.default_rng(seed)
            tgt = r2.uniform(-1, 1, size=(400, 3)).astype(np.float32)
            src = tgt @ np.linalg.inv(T_true)[:3, :3].T + np.linalg.inv(T_true)[:3, 3]
            clouds.append((
                Cloud(xyz=jnp.asarray(src.astype(np.float32)), mask=jnp.ones(400, bool)),
                Cloud(xyz=jnp.asarray(tgt), mask=jnp.ones(400, bool)),
            ))
        res = joint_icp([c[0] for c in clouds], [c[1] for c in clouds],
                        max_corr_dist=0.3, max_iterations=40)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.transform), T_true, atol=5e-3)


class TestValidation:
    def test_accepts_good_rejects_bad(self, rng):
        tgt = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
        src_c = Cloud(xyz=jnp.asarray(tgt), mask=jnp.ones(300, bool))
        tgt_c = Cloud(xyz=jnp.asarray(tgt), mask=jnp.ones(300, bool))
        good = validate_euclidean(src_c, tgt_c, jnp.eye(4), threshold=1e-4)
        assert bool(good.is_valid)
        T_bad = np.eye(4, dtype=np.float32)
        T_bad[:3, 3] = [0.5, 0, 0]
        bad = validate_euclidean(src_c, tgt_c, jnp.asarray(T_bad), threshold=1e-4)
        assert not bool(bad.is_valid)
        assert float(bad.score) > float(good.score)


class TestPyramid:
    def test_self_similarity_and_discrimination(self, rng):
        f1 = rng.normal(size=(400, 16)).astype(np.float32)
        f2 = f1 + rng.normal(scale=0.05, size=f1.shape).astype(np.float32)
        f3 = rng.uniform(-4, 4, size=(400, 16)).astype(np.float32)
        ranges = jnp.asarray(np.stack([np.full(16, -5.0), np.full(16, 5.0)], 1),
                             jnp.float32)
        m = jnp.ones(400, bool)
        p1 = build_pyramid(jnp.asarray(f1), m, ranges)
        p2 = build_pyramid(jnp.asarray(f2), m, ranges)
        p3 = build_pyramid(jnp.asarray(f3), m, ranges)
        s_self = float(compare_pyramids(p1, p1))
        s_near = float(compare_pyramids(p1, p2))
        s_far = float(compare_pyramids(p1, p3))
        assert abs(s_self - 1.0) < 1e-5
        assert s_near > s_far


class TestKFPCS:
    def test_coarse_alignment_on_structured_cloud(self, rng):
        # structured cloud (box edges) so ISS finds keypoints; anisotropic
        # scaling breaks the cube's 24-fold rotational symmetry, otherwise
        # congruent-set matching can legally return a symmetry pose
        t = np.linspace(-1, 1, 60, dtype=np.float32)
        scale = np.float32([1.0, 0.7, 0.45])
        edges = []
        for axis in range(3):
            for s1 in (-1, 1):
                for s2 in (-1, 1):
                    e = np.zeros((60, 3), np.float32)
                    e[:, axis] = t
                    e[:, (axis + 1) % 3] = s1
                    e[:, (axis + 2) % 3] = s2
                    edges.append(e * scale)
        tgt = np.concatenate(edges) + rng.normal(scale=0.005, size=(720, 3)).astype(np.float32)
        xi = (0.1, -0.05, 0.08, 0.15, 0.1, -0.1)
        T_true = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32)))
        src = (tgt - T_true[:3, 3]) @ T_true[:3, :3]
        res = kfpcs_align(
            Cloud(xyz=jnp.asarray(src.astype(np.float32)), mask=jnp.ones(720, bool)),
            Cloud(xyz=jnp.asarray(tgt), mask=jnp.ones(720, bool)),
            salient_radius=0.3, delta=0.05, key=jax.random.PRNGKey(3),
            n_bases=256,
        )
        assert bool(res.valid)
        # coarse alignment: rotation within ~0.1 rad, translation ~0.1
        T = np.asarray(res.transform)
        rot_err = np.arccos(np.clip((np.trace(T[:3, :3].T @ T_true[:3, :3]) - 1) / 2, -1, 1))
        assert rot_err < 0.15
        assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.2
