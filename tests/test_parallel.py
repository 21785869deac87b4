"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcl_tpu.core import transforms as tf


@pytest.fixture(scope="module")
def mesh8():
    from pcl_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


class TestShardedICP:
    def test_matches_single_device(self, mesh8, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from pcl_tpu.parallel.icp_sharded import sharded_icp
        from pcl_tpu.core import from_numpy
        from pcl_tpu.registration import icp

        n = 1024
        pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        xi = np.array([0.03, -0.02, 0.01, 0.02, 0.01, -0.03], np.float32)
        T_true = np.asarray(tf.se3_exp(jnp.asarray(xi)))
        dst_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]

        src_xyz = jax.device_put(jnp.asarray(pts), NamedSharding(mesh8, P("points", None)))
        src_mask = jax.device_put(jnp.ones(n, bool), NamedSharding(mesh8, P("points")))
        tgt_xyz = jax.device_put(jnp.asarray(dst_pts), NamedSharding(mesh8, P()))
        tgt_mask = jax.device_put(jnp.ones(n, bool), NamedSharding(mesh8, P()))

        T, mse, it = sharded_icp(
            mesh8, src_xyz, src_mask, tgt_xyz, tgt_mask,
            max_iterations=25,
        )
        np.testing.assert_allclose(np.asarray(T), T_true, atol=2e-3)

        # agrees with the single-device path
        res = icp(from_numpy(pts), from_numpy(dst_pts), max_iterations=25)
        np.testing.assert_allclose(np.asarray(T), np.asarray(res.transform), atol=1e-3)

    def test_point_to_plane_sharded(self, mesh8, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from pcl_tpu.parallel.icp_sharded import sharded_icp

        n = 512
        xy = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        pts = np.column_stack([xy, z]).astype(np.float32)
        dzdx = 0.6 * np.cos(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        dzdy = -0.6 * np.sin(2 * xy[:, 0]) * np.sin(2 * xy[:, 1])
        nrm = np.column_stack([-dzdx, -dzdy, np.ones(n)]).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        delta = np.float32([0.01, -0.02, 0.03])
        dst = pts + delta

        T, mse, _ = sharded_icp(
            mesh8,
            jax.device_put(jnp.asarray(pts), NamedSharding(mesh8, P("points", None))),
            jax.device_put(jnp.ones(n, bool), NamedSharding(mesh8, P("points"))),
            jax.device_put(jnp.asarray(dst), NamedSharding(mesh8, P())),
            jax.device_put(jnp.ones(n, bool), NamedSharding(mesh8, P())),
            tgt_normals=jax.device_put(jnp.asarray(nrm), NamedSharding(mesh8, P())),
            max_iterations=15,
            variant="point_to_plane",
        )
        np.testing.assert_allclose(np.asarray(T)[:3, 3], delta, atol=2e-3)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        T = np.asarray(out[0])
        assert T.shape == (4, 4)
        np.testing.assert_allclose(T[:3, 3], [-0.02, 0.01, -0.015], atol=2e-3)

    def test_dryrun_multichip(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)
