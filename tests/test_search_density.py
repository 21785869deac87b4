"""Density-probed cell parameters (search.auto_cell_params).

r5 milk-scene investigation: the bbox-volume density radius oversizes
cells by orders of magnitude on surface-like scans (points live on a 2-D
manifold inside a mostly-empty bounding volume), so the fixed bucket cap
silently dropped near neighbors and corrupted normals by up to 60 deg.
These tests pin the fix: on a strongly nonuniform synthetic surface at a
scale that engages the cell backend, auto-probed (cell_size, cap) must
reproduce brute-force normal neighborhoods.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from pcl_tpu.core.cloud import make_cloud, ATTR_NORMAL
from pcl_tpu import features, search
from pcl_tpu.features.normals import normals_from_neighborhoods


def _nonuniform_surface(n=40000, seed=3):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 1, n) ** 2.5          # ~25x density gradient
    v = rng.uniform(0, 1, n)
    x = u * 2.0
    y = v * 1.0
    z = 0.15 * np.sin(4.0 * x) * np.cos(5.0 * y)
    return np.stack([x, y, z], 1).astype(np.float32)


def test_auto_cell_params_cover_kth_neighbor():
    pts = _nonuniform_surface()
    cell, cap = search.auto_cell_params(make_cloud(jnp.asarray(pts)), k=10)
    tree = cKDTree(pts)
    d, _ = tree.query(pts[::97], 11)
    frac_covered = (d[:, -1] <= cell).mean()
    assert frac_covered >= 0.93, f"cell {cell} covers only {frac_covered}"
    # cap fits the measured occupancy (no silent truncation)
    ijk = np.floor(pts / cell).astype(np.int64)
    ijk -= ijk.min(0)
    dims = ijk.max(0) + 1
    key = (ijk[:, 2] * dims[1] + ijk[:, 1]) * dims[0] + ijk[:, 0]
    occ = np.bincount(np.unique(key, return_inverse=True)[1]).max()
    assert cap >= min(occ, 512)


@pytest.mark.slow
def test_nonuniform_normals_match_bruteforce():
    pts = _nonuniform_surface()
    c = features.estimate_normals(make_cloud(jnp.asarray(pts)), k=10)
    ours = np.asarray(c.attrs[ATTR_NORMAL])
    # ground truth on a sample: exact kd neighborhoods + the same
    # covariance math
    sel = np.arange(0, len(pts), 131)
    tree = cKDTree(pts)
    _, idx = tree.query(pts[sel], 10)
    n_ref, _ = normals_from_neighborhoods(
        jnp.asarray(pts[sel]), jnp.asarray(pts[idx]),
        jnp.ones(idx.shape, bool), jnp.zeros(3, jnp.float32))
    n_ref = np.asarray(n_ref)
    dots = np.abs((ours[sel] * n_ref).sum(1))
    assert np.quantile(dots, 0.02) > 0.995, (
        f"2% quantile of |normal dot| = {np.quantile(dots, 0.02)}")
    assert np.median(dots) > 0.9999
