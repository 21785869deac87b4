"""Pose-graph tests — LUM multi-scan consistency + ELCH loop distribution
(reference pipeline: tools/lum.cpp; test pattern from SURVEY §3.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


class TestLUMRealScans:
    """North-star config 4 on real data: the tools/lum.cpp pipeline
    (reference tools/lum.cpp:80-137) on the bun01-03 multi-scan bunny set —
    centroid loop detection, kd-tree correspondences, lum solve, inter-scan
    consistency must improve."""

    def _load_scans(self):
        from conftest import reference_pcd
        from pcl_tpu.io import pcd as pcd_io
        scans = []
        for name in ("bun01.pcd", "bun02.pcd", "bun03.pcd"):
            c = pcd_io.load(reference_pcd(name))
            xyz = np.asarray(c.xyz)[np.asarray(c.mask)]
            scans.append(xyz.astype(np.float32))
        return scans

    @staticmethod
    def _pair_corr(a, b, max_dist):
        """Nearest-neighbor correspondences via the native kd-tree — the
        CorrespondenceEstimation step of lum.cpp:101-117 (one-directional,
        distance-gated, like the reference)."""
        from pcl_tpu import native
        tb = native.KdTree(b)
        d2, ib = tb.knn(a, 1)
        sel = d2[:, 0] < max_dist ** 2
        return a[sel], b[ib[sel, 0]]

    @staticmethod
    def _consistency(scans, poses):
        """Mean pairwise NN distance between transformed scans."""
        from pcl_tpu import native
        tot, n = 0.0, 0
        world = [s @ np.asarray(p)[:3, :3].T + np.asarray(p)[:3, 3]
                 for s, p in zip(scans, poses)]
        for i in range(len(world)):
            for j in range(i + 1, len(world)):
                d2, _ = native.KdTree(world[j]).knn(world[i], 1)
                d = np.sqrt(d2[:, 0])
                d = d[d < 0.05]
                tot += d.sum()
                n += len(d)
        return tot / max(n, 1)

    def test_lum_improves_multiscan_consistency(self, rng):
        from pcl_tpu.registration.graph import lum, build_edges_from_correspondences
        scans = self._load_scans()
        V = len(scans)
        # loop detection by centroid distance (lum.cpp:94): all pairs of
        # the bunny views qualify
        cents = [s.mean(0) for s in scans]
        pairs = []
        for i in range(V):
            for j in range(i + 1, V):
                assert np.linalg.norm(cents[i] - cents[j]) < 5.0
                ps, pd = self._pair_corr(scans[i], scans[j], max_dist=0.04)
                assert len(ps) > 50, (i, j, len(ps))
                pairs.append((i, j, ps, pd))
        es, ed, cs, cd, cv = build_edges_from_correspondences(pairs, 4096)

        # perturb poses 1..V-1 (scans arrive roughly pre-aligned; the solver
        # must both absorb the perturbation and tighten the original layout)
        init = np.stack([np.eye(4, dtype=np.float32)] * V)
        for v in range(1, V):
            xi = (rng.normal(size=6) * np.r_[0.002, 0.002, 0.002, 0.01, 0.01, 0.01]).astype(np.float32)
            init[v] = np.asarray(tf.se3_exp(jnp.asarray(xi))) @ init[v]

        before = self._consistency(scans, init)
        res = lum(jnp.asarray(init), es, ed, cs, cd, cv, max_iterations=10)
        after = self._consistency(scans, np.asarray(res.poses))
        assert float(res.residual) < before ** 2 * 10
        assert after < before * 0.9, (before, after)
        # and the result should also beat the unperturbed raw layout
        raw = self._consistency(scans, np.stack([np.eye(4)] * V))
        assert after < raw * 1.05, (raw, after)

    def test_cg_matches_dense(self, rng):
        from pcl_tpu.registration.graph import lum, build_edges_from_correspondences
        scans = self._load_scans()
        pairs = []
        for i, j in [(0, 1), (1, 2), (0, 2)]:
            ps, pd = self._pair_corr(scans[i], scans[j], max_dist=0.04)
            pairs.append((i, j, ps, pd))
        es, ed, cs, cd, cv = build_edges_from_correspondences(pairs, 2048)
        init = jnp.stack([jnp.eye(4, dtype=jnp.float32)] * 3)
        r_dense = lum(init, es, ed, cs, cd, cv, max_iterations=5)
        r_cg = lum(init, es, ed, cs, cd, cv, max_iterations=5,
                   solver="cg", cg_iters=64)
        np.testing.assert_allclose(np.asarray(r_cg.poses),
                                   np.asarray(r_dense.poses), atol=5e-4)


class TestGraphOptimizerInterface:
    """Pluggable PoseGraph/optimize dispatch (registration/graph_optimizer.py,
    reference graph_optimizer.h/graph_handler.h)."""

    def _two_scan_graph(self, rng):
        from pcl_tpu.registration.graph_optimizer import PoseGraph
        pts = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
        offset = np.float32([0.1, -0.05, 0.02])
        g = PoseGraph()
        g.add_vertex()
        g.add_vertex()
        # scan1 = scan0 shifted: correspondences p in frame0 <-> p - offset
        g.add_edge(0, 1, pts, pts - offset)
        g.add_edge(1, 0, pts - offset, pts)
        return g, offset

    def test_lum_backend(self, rng):
        g, offset = self._two_scan_graph(rng)
        poses = g.optimize("lum", max_iterations=5)
        assert poses.shape == (2, 4, 4)
        # vertex 1's pose moves scan-1 points back onto scan 0
        np.testing.assert_allclose(poses[1][:3, 3], offset, atol=5e-3)

    def test_cg_matches_dense(self, rng):
        g, _ = self._two_scan_graph(rng)
        dense = g.optimize("lum", max_iterations=3)
        g2, _ = self._two_scan_graph(rng)
        cg = g2.optimize("lum_cg", max_iterations=3, cg_iters=64)
        np.testing.assert_allclose(dense, cg, atol=1e-3)

    def test_elch_backend(self, rng):
        from pcl_tpu.registration.graph_optimizer import PoseGraph
        g = PoseGraph()
        for _ in range(4):
            g.add_vertex()
        loop_T = np.eye(4, dtype=np.float32)
        loop_T[0, 3] = 0.4
        poses = g.optimize("elch", loop_transform=loop_T)
        # correction ramps 0 -> full along the chain
        np.testing.assert_allclose(poses[0][0, 3], 0.0, atol=1e-6)
        np.testing.assert_allclose(poses[3][0, 3], 0.4, atol=1e-5)

    def test_custom_backend_registration(self, rng):
        from pcl_tpu.registration.graph_optimizer import (
            PoseGraph, register_optimizer)
        called = {}

        def identity_opt(graph, **kw):
            called["n"] = graph.n_vertices
            return graph.poses()

        register_optimizer("identity", identity_opt)
        g, _ = self._two_scan_graph(rng)
        g.optimize("identity")
        assert called["n"] == 2
        with pytest.raises(ValueError):
            g.optimize("nope")
