"""Trajectory ATE/RPE harness + sequence odometry (north-star metric #2).

The reference's accuracy oracle is golden-transform asserts (reference:
test/registration/test_registration.cpp:251-264) and the LUM multi-scan
pipeline (tools/lum.cpp:80-137); these tests chain scans -> incremental
registration -> trajectory -> ATE so a regression in any registration
component surfaces as a trajectory number.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.registration.trajectory import (
    trajectory_ate, trajectory_rpe, odometry_sequence, make_drift_sequence,
    umeyama_se3,
)


def _cloud(xyz):
    return Cloud(xyz=jnp.asarray(xyz, jnp.float32),
                 mask=jnp.ones((len(xyz),), bool))


def _scene(rng, n=4000):
    """Structured synthetic scene: three non-parallel planes + blob — full
    6-DoF constraint for point-to-point ICP."""
    a = rng.uniform(-1, 1, size=(n // 3, 2))
    p1 = np.c_[a[:, 0], a[:, 1], 0.05 * np.sin(3 * a[:, 0])]
    p2 = np.c_[a[: n // 3, 0], -1 + 0.05 * np.sin(3 * a[: n // 3, 1]), a[: n // 3, 1]]
    p3 = np.c_[1 + 0.05 * np.cos(3 * a[: n // 3, 1]), a[: n // 3, 0], a[: n // 3, 1]]
    blob = rng.normal(scale=0.2, size=(n - 3 * (n // 3) + n // 6, 3)) + [0.3, 0.3, 0.5]
    return np.concatenate([p1, p2, p3, blob]).astype(np.float32)


class TestATEMath:
    def test_identity(self, rng):
        poses = np.stack([np.eye(4)] * 5)
        for k in range(5):
            poses[k, :3, 3] = rng.normal(size=3)
        r = trajectory_ate(poses, poses)
        assert r.rmse < 1e-12
        assert r.max < 1e-12

    def test_gauge_invariance(self, rng):
        """A rigid transform of the whole estimated trajectory must not
        change aligned ATE (the standard Sturm definition)."""
        M = 8
        poses = np.stack([np.eye(4)] * M)
        for k in range(M):
            poses[k, :3, 3] = np.array([0.1 * k, np.sin(0.3 * k), 0.0])
        noisy = poses.copy()
        noisy[:, :3, 3] += rng.normal(scale=0.01, size=(M, 3))
        base = trajectory_ate(noisy, poses).rmse
        # apply an arbitrary rigid gauge to the estimate
        from scipy.spatial.transform import Rotation
        G = np.eye(4)
        G[:3, :3] = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
        G[:3, 3] = [1.0, -2.0, 0.7]
        moved = np.einsum("ij,mjk->mik", G, noisy)
        assert trajectory_ate(moved, poses).rmse == pytest.approx(base, rel=1e-6)
        # unaligned ATE, by contrast, sees the gauge
        assert trajectory_ate(moved, poses, align=False).rmse > 0.5

    def test_known_offset_unaligned(self):
        M = 6
        poses = np.stack([np.eye(4)] * M)
        for k in range(M):
            poses[k, :3, 3] = [k * 0.5, 0, 0]
        shifted = poses.copy()
        shifted[:, 2, 3] += 0.25
        r = trajectory_ate(shifted, poses, align=False)
        assert r.rmse == pytest.approx(0.25, abs=1e-9)
        assert r.max == pytest.approx(0.25, abs=1e-9)

    def test_umeyama_recovers_transform(self, rng):
        from scipy.spatial.transform import Rotation
        src = rng.normal(size=(20, 3))
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec([0.2, 0.1, -0.4]).as_matrix()
        T[:3, 3] = [0.5, -1.0, 2.0]
        dst = src @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(umeyama_se3(src, dst), T, atol=1e-10)

    def test_rpe_detects_single_bad_step(self):
        M = 6
        poses = np.stack([np.eye(4)] * M)
        for k in range(M):
            poses[k, :3, 3] = [k * 0.1, 0, 0]
        bad = poses.copy()
        bad[3:, :3, 3] += [0, 0.2, 0]   # one bad step at k=3, then clean
        r = trajectory_rpe(bad, poses, delta=1)
        assert np.count_nonzero(r.trans_errors > 1e-9) == 1
        assert r.trans_errors.max() == pytest.approx(0.2, abs=1e-9)


class TestSyntheticDriftOdometry:
    def test_icp_odometry_recovers_trajectory(self, rng):
        scene = _scene(rng)
        scans, golden = make_drift_sequence(scene, 5, rng,
                                            step_translation=0.03,
                                            step_rotation=0.03)
        poses = odometry_sequence([_cloud(s) for s in scans],
                                  max_corr_dist=0.25, max_iterations=40)
        r = trajectory_ate(poses, golden, align=False)
        # exact same points, modest motion: mm-level recovery expected
        assert r.rmse < 2e-3, r
        # regression sensitivity: a crippled aligner must show up in ATE
        bad = odometry_sequence([_cloud(s) for s in scans],
                                max_corr_dist=0.25, max_iterations=1)
        assert trajectory_ate(bad, golden, align=False).rmse > 5 * r.rmse

    def test_gicp_odometry_with_noise(self, rng):
        from pcl_tpu.registration.gicp import gicp
        scene = _scene(rng)
        scans, golden = make_drift_sequence(scene, 4, rng,
                                            step_translation=0.03,
                                            step_rotation=0.03,
                                            noise=0.002)
        poses = odometry_sequence(
            [_cloud(s) for s in scans],
            register=lambda s, t: gicp(s, t, max_corr_dist=0.25,
                                       max_iterations=30))
        r = trajectory_ate(poses, golden, align=False)
        # per-scan noise 2 mm; trajectory should stay within a few mm
        assert r.rmse < 6e-3, r


class TestVirtualScanSequence:
    """Virtual-scanner odometry over the real office1 scene (the bench's
    ate_rmse_m headline path, VERDICT r3 #4): partial frustum-cropped
    views with ground-truth poses; aligned ATE must stay within a pinned
    threshold."""

    def test_office_virtual_scans(self):
        from conftest import reference_pcd
        from pcl_tpu.io import pcd as pcd_io
        from pcl_tpu.registration.trajectory import (
            make_virtual_scan_sequence, odometry_sequence, trajectory_ate)
        c = pcd_io.load(reference_pcd("office1.pcd"))
        scene = np.asarray(c.xyz)[np.asarray(c.mask)]
        rng = np.random.default_rng(11)
        scans, golden = make_virtual_scan_sequence(
            scene, n_scans=4, rng=rng, step_translation=0.05,
            step_rotation=0.02, max_points=8000, noise=0.002)
        assert all(len(s) > 2000 for s in scans), [len(s) for s in scans]
        # partial views genuinely differ (frustum crop does something)
        assert len(scans[0]) <= 8000
        clouds = [_cloud(s) for s in scans]
        poses = odometry_sequence(clouds, max_corr_dist=0.25,
                                  max_iterations=40,
                                  corr_backend="bruteforce")
        r = trajectory_ate(poses, golden, align=True)
        # 2 mm noise, 8k-point partial views: a healthy odometry stays in
        # the few-mm band; divergence lands at decimeters
        assert r.rmse < 2e-2, r


class TestBunnySequenceATE:
    """Real multi-scan data (reference fixtures bun01-03): the scans arrive
    roughly pre-aligned, so golden poses = identity; incremental GICP
    odometry must stay within a tight ATE of that layout — the bunny
    equivalent of the north star's 'trajectories within the reference ATE
    bound on multi-scan sets'."""

    @staticmethod
    def _consistency(scans, poses):
        """Mean pairwise NN distance between transformed scans (the LUM
        pipeline's quality signal, tests/test_graph.py)."""
        from scipy.spatial import cKDTree
        tot, n = 0.0, 0
        world = [s @ np.asarray(p)[:3, :3].T + np.asarray(p)[:3, 3]
                 for s, p in zip(scans, poses)]
        for i in range(len(world)):
            for j in range(i + 1, len(world)):
                d, _ = cKDTree(world[j]).query(world[i], k=1)
                d = d[d < 0.05]
                tot += d.sum()
                n += len(d)
        return tot / max(n, 1)

    def test_bun_sequence(self):
        from conftest import reference_pcd
        from pcl_tpu.io import pcd as pcd_io
        from pcl_tpu.registration.gicp import gicp
        scans, clouds = [], []
        for name in ("bun01.pcd", "bun02.pcd", "bun03.pcd"):
            c = pcd_io.load(reference_pcd(name))
            xyz = np.asarray(c.xyz)[np.asarray(c.mask)]
            scans.append(xyz)
            clouds.append(_cloud(xyz))
        poses = odometry_sequence(
            clouds,
            register=lambda s, t: gicp(s, t, max_corr_dist=0.04,
                                       max_iterations=40))
        golden = np.stack([np.eye(4)] * 3)
        r = trajectory_ate(poses, golden, align=False)
        # the raw scans are pre-aligned only to ~1 cm (the LUM test's whole
        # premise is that the identity layout can be tightened), so identity
        # is a SANITY golden: a diverged odometry lands decimeters away
        assert r.rmse < 2e-2, r
        # the real accuracy oracle: the odometry trajectory must describe
        # the scene at least as consistently as the shipped layout
        raw = self._consistency(scans, golden)
        est = self._consistency(scans, poses)
        assert est < raw * 1.05, (raw, est)
