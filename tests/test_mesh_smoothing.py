"""surface/mesh_smoothing.py — the vtk_smoothing family equivalents."""

import numpy as np
import pytest

from pcl_tpu.surface import mesh_smoothing as ms


@pytest.fixture
def noisy_grid(rng):
    """A flat triangulated grid with z-noise; smoothing should flatten it."""
    n = 12
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    z = rng.normal(scale=0.2, size=(n, n)).astype(np.float32)
    v = np.stack([xs.ravel(), ys.ravel(), z.ravel()], 1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            tris.append([a, a + 1, a + n])
            tris.append([a + 1, a + n + 1, a + n])
    return v, np.asarray(tris, np.int32)


def test_laplacian_flattens(noisy_grid):
    v, t = noisy_grid
    out = ms.laplacian_smooth(v, t, n_iterations=30, relaxation=0.3)
    interior = ~ms.boundary_vertices(v, t)
    # fixed noisy boundary limits interior convergence; ~2x reduction
    assert np.abs(out[interior, 2]).std() < np.abs(v[interior, 2]).std() * 0.6
    # boundary held fixed
    b = ms.boundary_vertices(v, t)
    np.testing.assert_array_equal(out[b], v[b])


def test_taubin_less_shrink_than_laplacian(noisy_grid, rng):
    # on a sphere: Taubin preserves radius far better than pure Laplacian
    u = rng.normal(size=(400, 3)); u /= np.linalg.norm(u, axis=1, keepdims=True)
    from scipy.spatial import ConvexHull
    hull = ConvexHull(u)
    v, t = u.astype(np.float32), hull.simplices.astype(np.int32)
    lap = ms.laplacian_smooth(v, t, n_iterations=30, relaxation=0.5,
                              fix_boundary=False)
    tau = ms.taubin_smooth(v, t, n_iterations=30)
    r_lap = np.linalg.norm(lap, axis=1).mean()
    r_tau = np.linalg.norm(tau, axis=1).mean()
    assert r_tau > r_lap
    assert abs(r_tau - 1.0) < 0.1


def test_subdivide_linear(noisy_grid):
    v, t = noisy_grid
    v2, t2 = ms.subdivide_linear(v, t)
    assert len(t2) == 4 * len(t)
    # Euler characteristic preserved for a disc: V - E + F = 1
    def euler(v_, t_):
        e = np.concatenate([t_[:, [0, 1]], t_[:, [1, 2]], t_[:, [2, 0]]])
        e = np.unique(np.sort(e, axis=1), axis=0)
        return len(v_) - len(e) + len(t_)
    assert euler(v, t) == euler(v2, t2) == 1
    # midpoints exactly between parents
    assert v2.shape[0] > v.shape[0]


def test_decimate_cluster(noisy_grid):
    v, t = noisy_grid
    v2, t2 = ms.decimate_cluster(v, t, target_reduction=0.7)
    assert len(v2) < len(v) * 0.6
    assert len(t2) < len(t)
    # surviving triangles index valid vertices
    assert t2.max() < len(v2)
    # decimated mesh stays inside the (slightly padded) original bbox
    assert (v2.min(0) >= v.min(0) - 1e-3).all()
    assert (v2.max(0) <= v.max(0) + 1e-3).all()
