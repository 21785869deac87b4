"""Correspondence rejectors + FPCS coarse alignment tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu.core import transforms as tf
from pcl_tpu.registration.correspondence import (
    Correspondences, determine_correspondences,
)
from pcl_tpu.registration import rejection as rej
from pcl_tpu.registration.fpcs import fpcs_align
from pcl_tpu.registration.icp import icp, fitness_score


class TestRejectors:
    def _corrs(self, rng, n=100):
        idx = jnp.asarray(rng.permutation(n).astype(np.int32))
        d2 = jnp.asarray(rng.random(n).astype(np.float32))
        return Correspondences(idx, d2, jnp.ones(n, bool))

    def test_distance(self, rng):
        c = self._corrs(rng)
        out = rej.reject_distance(c, 0.5)
        np.testing.assert_array_equal(
            np.asarray(out.valid), np.asarray(c.sqdist) <= 0.25)

    def test_median(self, rng):
        c = self._corrs(rng)
        out = rej.reject_median_distance(c, factor=1.0)
        frac = np.asarray(out.valid).mean()
        assert 0.4 < frac < 0.6

    def test_trimmed(self, rng):
        c = self._corrs(rng)
        out = rej.reject_trimmed(c, overlap_ratio=0.3)
        assert np.asarray(out.valid).sum() == 30
        kept_d = np.asarray(c.sqdist)[np.asarray(out.valid)]
        dropped_d = np.asarray(c.sqdist)[~np.asarray(out.valid)]
        assert kept_d.max() <= dropped_d.min() + 1e-6

    def test_one_to_one(self, rng):
        idx = jnp.asarray(np.array([0, 0, 1, 1, 2], np.int32))
        d2 = jnp.asarray(np.array([0.5, 0.1, 0.2, 0.3, 0.9], np.float32))
        c = Correspondences(idx, d2, jnp.ones(5, bool))
        out = rej.reject_one_to_one(c)
        np.testing.assert_array_equal(
            np.asarray(out.valid), [False, True, True, False, True])

    def test_surface_normals(self, rng):
        n = 50
        src_n = np.tile(np.float32([0, 0, 1]), (n, 1))
        tgt_n = src_n.copy()
        tgt_n[:10] = [1, 0, 0]   # perpendicular -> rejected
        c = Correspondences(jnp.arange(n, dtype=jnp.int32),
                            jnp.zeros(n), jnp.ones(n, bool))
        out = rej.reject_surface_normals(c, jnp.asarray(src_n), jnp.asarray(tgt_n))
        v = np.asarray(out.valid)
        assert not v[:10].any() and v[10:].all()

    def test_sample_consensus(self, rng):
        n = 200
        src = rng.normal(size=(n, 3)).astype(np.float32)
        T = np.asarray(tf.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.1, -0.2, 0.3], jnp.float32)))
        tgt = src @ T[:3, :3].T + T[:3, 3]
        bad = rng.random(n) < 0.3
        tgt[bad] += rng.uniform(1, 2, size=(bad.sum(), 3)).astype(np.float32)
        c = Correspondences(jnp.arange(n, dtype=jnp.int32), jnp.zeros(n),
                            jnp.ones(n, bool))
        out = rej.reject_sample_consensus(
            c, jnp.asarray(src), jnp.asarray(tgt), inlier_threshold=0.05,
            key=jax.random.PRNGKey(1))
        v = np.asarray(out.valid)
        assert v[~bad].mean() > 0.95 and v[bad].mean() < 0.1


class TestFPCS:
    def test_recovers_large_motion(self, rng):
        # structured scene, large rotation: featureless coarse alignment
        n3 = 250
        a = np.stack([rng.uniform(0, 2, n3), rng.uniform(0, 1, n3),
                      0.3 * rng.uniform(0, 2, n3) ** 2], 1)
        b = np.stack([rng.uniform(0, 1, n3), np.zeros(n3), rng.uniform(0, 1, n3)], 1)
        tgt = np.concatenate([a, b]).astype(np.float32)
        T_true = np.asarray(tf.se3_exp(jnp.asarray(
            [0.4, -0.2, 0.3, 0.0, 0.0, 1.0], jnp.float32)))
        src = (tgt - T_true[:3, 3]) @ T_true[:3, :3]
        src_c = make_cloud(jnp.asarray(src.astype(np.float32)))
        tgt_c = make_cloud(jnp.asarray(tgt))
        res = fpcs_align(src_c, tgt_c, delta=0.05, key=jax.random.PRNGKey(3),
                         n_bases=256)
        assert bool(res.valid)
        fit0 = float(fitness_score(src_c, tgt_c, jnp.eye(4)))
        fit = float(fitness_score(src_c, tgt_c, res.transform))
        assert fit < 0.2 * fit0
        # refined by ICP it reaches the truth
        ref = icp(src_c, tgt_c, init_transform=res.transform,
                  max_corr_dist=0.3, max_iterations=30)
        assert np.abs(np.asarray(ref.transform) - T_true).max() < 0.05
