"""Pose-graph tests — LUM multi-scan consistency + ELCH loop distribution
(reference pipeline: tools/lum.cpp; test pattern from SURVEY §3.4)."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core import transforms as tf
from pcl_tpu.registration.graph import (
    lum, elch_distribute, build_edges_from_correspondences,
)


def _rand_xi(rng, scale=0.1):
    return (rng.normal(size=6) * scale).astype(np.float32)


class TestLUM:
    def test_chain_converges_to_truth(self, rng):
        """4 scans of one scene; noisy initial poses; full correspondences.
        After LUM, relative poses must match the ground truth."""
        scene = rng.normal(size=(200, 3)).astype(np.float32)
        V = 4
        true_poses = [np.eye(4, dtype=np.float32)]
        for _ in range(V - 1):
            step = np.asarray(tf.se3_exp(jnp.asarray(_rand_xi(rng, 0.3))))
            true_poses.append(true_poses[-1] @ step)
        true_poses = np.stack(true_poses)
        # scan v = scene seen from pose v: p_v = T_v^{-1} applied to scene
        scans = []
        for v in range(V):
            Tinv = np.linalg.inv(true_poses[v])
            scans.append(scene @ Tinv[:3, :3].T + Tinv[:3, 3])

        # edges between consecutive scans + a loop edge 0-3, perfect
        # correspondences by construction (same scene indices)
        pairs = []
        for (i, j) in [(0, 1), (1, 2), (2, 3), (0, 3)]:
            pairs.append((i, j, scans[i], scans[j]))
        es, ed, cs, cd, cv = build_edges_from_correspondences(pairs, 200)

        # corrupt initial poses (keep pose 0 exact = gauge)
        init = true_poses.copy()
        for v in range(1, V):
            noise = np.asarray(tf.se3_exp(jnp.asarray(_rand_xi(rng, 0.05))))
            init[v] = noise @ init[v]

        res = lum(jnp.asarray(init), es, ed, cs, cd, cv, max_iterations=10)
        P = np.asarray(res.poses)
        assert float(res.residual) < 1e-6
        for v in range(V):
            # compare relative to vertex 0 (global gauge is fixed there)
            rel_est = np.linalg.inv(P[0]) @ P[v]
            rel_true = np.linalg.inv(true_poses[0]) @ true_poses[v]
            np.testing.assert_allclose(rel_est, rel_true, atol=1e-3)

    def test_partial_correspondences(self, rng):
        scene = rng.normal(size=(300, 3)).astype(np.float32)
        T_step = np.asarray(tf.se3_exp(jnp.asarray(_rand_xi(rng, 0.2))))
        scan0 = scene
        Tinv = np.linalg.inv(T_step)
        scan1 = scene @ Tinv[:3, :3].T + Tinv[:3, 3]
        # only 150 of 300 correspondences, padded to 256
        pairs = [(0, 1, scan0[:150], scan1[:150])]
        es, ed, cs, cd, cv = build_edges_from_correspondences(pairs, 256)
        init = np.stack([np.eye(4, dtype=np.float32)] * 2)
        res = lum(jnp.asarray(init), es, ed, cs, cd, cv, max_iterations=10)
        P = np.asarray(res.poses)
        np.testing.assert_allclose(np.linalg.inv(P[0]) @ P[1], T_step, atol=1e-3)


class TestELCH:
    def test_distributes_correction(self, rng):
        V = 5
        poses = jnp.stack([jnp.eye(4)] * V)
        xi = jnp.asarray([0.2, 0.0, 0.0, 0.0, 0.0, 0.4], jnp.float32)
        T_loop = tf.se3_exp(xi)
        out = np.asarray(elch_distribute(poses, T_loop))
        # first vertex unchanged, last gets the full correction
        np.testing.assert_allclose(out[0], np.eye(4), atol=1e-6)
        np.testing.assert_allclose(out[-1], np.asarray(T_loop), atol=1e-5)
        # intermediate translations increase monotonically
        tx = out[:, 0, 3]
        assert (np.diff(tx) > 0).all()


class TestIncremental:
    def test_odometry_chain(self, rng):
        from pcl_tpu.core.cloud import make_cloud
        from pcl_tpu.registration.incremental import IncrementalRegistration
        scene = rng.normal(size=(400, 3)).astype(np.float32)
        step = np.asarray(tf.se3_exp(jnp.asarray([0.05, 0.02, -0.03, 0.02, 0.01, 0.04], jnp.float32)))
        inc = IncrementalRegistration(max_corr_dist=0.5, max_iterations=30)
        T_world = np.eye(4, dtype=np.float32)
        for k in range(3):
            Tinv = np.linalg.inv(T_world)
            scan = scene @ Tinv[:3, :3].T + Tinv[:3, 3]
            ok = inc.register_cloud(make_cloud(jnp.asarray(scan.astype(np.float32))))
            assert ok
            T_world = T_world @ step  # next scan pose moves on
        # scan_k = T_k^{-1}(scene); pairwise align(scan_k -> scan_{k-1})
        # yields `step`, so after 2 alignments abs = step @ step (maps
        # scan-2 points into scan-0's frame)
        est = np.asarray(inc.absolute_transform)
        np.testing.assert_allclose(est, step @ step, atol=5e-3)
