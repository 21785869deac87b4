"""NDT2D scan matching (reference test/registration/test_ndt.cpp NDT2D
section: recover a small planar offset between two scans)."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.registration import ndt_2d


def _scan(rng, n=1500):
    """Synthetic 2D 'room' scan: two walls + scatter, z=0."""
    t = rng.uniform(0, 4, n // 2).astype(np.float32)
    wall_x = np.stack([t, np.zeros_like(t)], 1)
    wall_y = np.stack([np.zeros_like(t), t], 1)
    pts = np.concatenate([wall_x, wall_y], 0)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    return np.concatenate([pts, np.zeros((pts.shape[0], 1), np.float32)], 1)


def _cloud(xyz):
    return Cloud(xyz=jnp.asarray(xyz), mask=jnp.ones((xyz.shape[0],), bool))


def test_ndt2d_recovers_planar_offset(rng):
    tgt = _scan(rng)
    theta = 0.08
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]], np.float32)
    src = tgt.copy()
    # source = target moved by the INVERSE of (R, t): aligning source onto
    # target should recover (tx, ty, theta)
    src[:, :2] = (tgt[:, :2] - np.float32([0.15, -0.1])) @ R  # R^T applied
    res = ndt_2d(_cloud(src), _cloud(tgt), grid_extent=0.8, max_iterations=60)
    assert bool(res.converged)
    tx, ty, th = np.asarray(res.params)
    assert abs(th - theta) < 0.02
    assert abs(tx - 0.15) < 0.05
    assert abs(ty - (-0.1)) < 0.05
    # transform maps source points onto target
    T = np.asarray(res.transform)
    src_h = np.concatenate([src, np.ones((src.shape[0], 1), np.float32)], 1)
    aligned = src_h @ T.T
    err = np.linalg.norm(aligned[:, :2] - tgt[:, :2], axis=1)
    assert np.median(err) < 0.05


def test_ndt2d_identity_is_fixed_point(rng):
    tgt = _scan(rng)
    res = ndt_2d(_cloud(tgt), _cloud(tgt), grid_extent=0.8, max_iterations=30)
    assert bool(res.converged)
    assert np.linalg.norm(np.asarray(res.params)) < 5e-2
