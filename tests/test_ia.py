"""Initial-alignment tests: FPFH + SAC-IA / prerejective recover a large
rotation that plain ICP cannot (the reference's test_sac_ia.cpp scenario)."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu.core import transforms as tf
from pcl_tpu import features
from pcl_tpu.registration.ia import sac_ia, prerejective_ransac, feature_knn
from pcl_tpu.registration.icp import icp, fitness_score


def scene(rng, n=600):
    """Asymmetric structured scene (no rotational symmetry)."""
    n3 = n // 3
    a = np.stack([rng.uniform(0, 2, n3), rng.uniform(0, 1, n3),
                  0.2 * rng.uniform(0, 2, n3) ** 2], 1)
    b = np.stack([rng.uniform(0, 1, n3), np.zeros(n3), rng.uniform(0, 1, n3)], 1)
    t = rng.uniform(0, 2, n - 2 * n3)
    c = np.stack([t, 0.5 + 0.3 * np.sin(3 * t), 0.5 * t], 1)
    pts = np.concatenate([a, b, c]).astype(np.float32)
    return pts + rng.normal(scale=0.005, size=pts.shape).astype(np.float32)


BIG_XI = np.array([0.5, -0.3, 0.4, 0.0, 0.0, 1.2], np.float32)  # ~69 deg yaw


def _prepare(rng):
    tgt = scene(rng)
    T_true = np.asarray(tf.se3_exp(jnp.asarray(BIG_XI)))
    src = (tgt - T_true[:3, 3]) @ T_true[:3, :3]
    src_c = make_cloud(jnp.asarray(src.astype(np.float32)))
    tgt_c = make_cloud(jnp.asarray(tgt))
    src_n = features.estimate_normals(src_c, k=12, viewpoint=jnp.asarray([0.0, 0, 100]))
    tgt_n = features.estimate_normals(tgt_c, k=12, viewpoint=jnp.asarray([0.0, 0, 100]))
    fs = features.estimate_fpfh(src_n, k=16)
    ft = features.estimate_fpfh(tgt_n, k=16)
    return src_c, tgt_c, fs, ft, T_true


class TestFeatureMatching:
    def test_knn_self_match(self, rng):
        tgt = scene(rng)
        c = make_cloud(jnp.asarray(tgt))
        cn = features.estimate_normals(c, k=12)
        f = features.estimate_fpfh(cn, k=16)
        idx = feature_knn(f, c.mask, f, c.mask, k=1)
        # identical descriptors: each point's best match is itself (or a
        # twin with identical geometry)
        self_match = (np.asarray(idx)[:, 0] == np.arange(len(tgt))).mean()
        assert self_match > 0.8


class TestSACIA:
    def test_recovers_big_rotation(self, rng):
        src_c, tgt_c, fs, ft, T_true = _prepare(rng)
        res = sac_ia(src_c, fs, tgt_c, ft, key=jax.random.PRNGKey(3),
                     n_hypotheses=512)
        assert bool(res.valid)
        fit0 = float(fitness_score(src_c, tgt_c, jnp.eye(4)))
        fit = float(fitness_score(src_c, tgt_c, res.transform))
        # coarse alignment: an order of magnitude better than identity
        assert fit < 0.1 * fit0, (fit, fit0)
        # and ICP refinement from it converges to the truth
        ref = icp(src_c, tgt_c, init_transform=res.transform,
                  max_corr_dist=0.2, max_iterations=30)
        T = np.asarray(ref.transform)
        assert np.abs(T - T_true).max() < 0.05


class TestPrerejective:
    def test_recovers_big_rotation(self, rng):
        src_c, tgt_c, fs, ft, T_true = _prepare(rng)
        res = prerejective_ransac(src_c, fs, tgt_c, ft,
                                  key=jax.random.PRNGKey(4),
                                  inlier_threshold=0.1)
        assert bool(res.valid)
        ref = icp(src_c, tgt_c, init_transform=res.transform,
                  max_corr_dist=0.2, max_iterations=30)
        T = np.asarray(ref.transform)
        assert np.abs(T - T_true).max() < 0.05
