"""Smoke tests for the second batch of CLI tools (transform, uniform
sampling, MLS, LUM/ELCH pipelines, NDT2D, reconstruction, concatenation,
plane projection)."""

import numpy as np
import pytest

from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.io import save_pcd, load_pcd


@pytest.fixture
def small_pcd(tmp_path, rng):
    xyz = rng.normal(size=(250, 3)).astype(np.float32)
    p = tmp_path / "in.pcd"
    save_pcd(p, from_numpy(xyz))
    return str(p)


@pytest.fixture
def surface_pcd(tmp_path, rng):
    """Gently curved surface patch — reconstructable."""
    uv = rng.uniform(-1, 1, size=(600, 2)).astype(np.float32)
    z = 0.2 * (uv[:, 0] ** 2 - uv[:, 1] ** 2)
    xyz = np.column_stack([uv, z]).astype(np.float32)
    p = tmp_path / "surf.pcd"
    save_pcd(p, from_numpy(xyz))
    return str(p)


def test_transform_point_cloud(small_pcd, tmp_path):
    from pcl_tpu.tools.transform_point_cloud import main
    out = str(tmp_path / "t.pcd")
    assert main([small_pcd, out, "-trans", "1,2,3"]) == 0
    a = np.asarray(load_pcd(small_pcd).xyz)
    b = np.asarray(load_pcd(out).xyz)
    np.testing.assert_allclose(b, a + np.float32([1, 2, 3]), atol=1e-5)


def test_transform_axisangle_matches_quat(small_pcd, tmp_path):
    from pcl_tpu.tools.transform_point_cloud import main
    o1 = str(tmp_path / "aa.pcd")
    o2 = str(tmp_path / "q.pcd")
    theta = 0.5
    assert main([small_pcd, o1, "-axisangle", f"0,0,1,{theta}"]) == 0
    q = f"0,0,{np.sin(theta/2)},{np.cos(theta/2)}"
    assert main([small_pcd, o2, "-quat", q]) == 0
    np.testing.assert_allclose(
        np.asarray(load_pcd(o1).xyz), np.asarray(load_pcd(o2).xyz), atol=1e-5)


def test_uniform_sampling(small_pcd, tmp_path):
    from pcl_tpu.tools.uniform_sampling import main
    out = str(tmp_path / "u.pcd")
    assert main([small_pcd, out, "-radius", "0.5"]) == 0
    a = load_pcd(small_pcd)
    b = load_pcd(out)
    assert 0 < int(b.count) < int(a.count)


def test_mls_smoothing(surface_pcd, tmp_path):
    from pcl_tpu.tools.mls_smoothing import main
    out = str(tmp_path / "mls.pcd")
    assert main([surface_pcd, out, "-radius", "0.3"]) == 0
    assert int(load_pcd(out).count) > 0


def test_lum_pipeline(tmp_path, rng):
    from pcl_tpu.tools.lum import main
    base = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
    paths = []
    for i, off in enumerate([(0, 0, 0), (0.05, 0, 0), (0, 0.05, 0)]):
        p = tmp_path / f"scan{i}.pcd"
        save_pcd(p, from_numpy(base + np.float32(off)))
        paths.append(str(p))
    assert main([*paths, "-corr_dist", "0.5", "-max_corr", "256"]) == 0
    for p in paths:
        assert (tmp_path / p.replace(str(tmp_path) + "/", "").replace(
            ".pcd", "_out.pcd")).exists()


def test_elch_pipeline(tmp_path, rng):
    from pcl_tpu.tools.elch import main
    base = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
    paths = []
    for i, off in enumerate([(0, 0, 0), (0.2, 0, 0), (0.02, 0, 0)]):
        p = tmp_path / f"s{i}.pcd"
        save_pcd(p, from_numpy(base + np.float32(off)))
        paths.append(str(p))
    assert main([*paths, "-dist", "0.3", "-iter", "20"]) == 0
    assert (tmp_path / "s2_out.pcd").exists()


def test_ndt2d_tool(tmp_path, rng):
    from pcl_tpu.tools.ndt2d import main
    t = rng.uniform(0, 3, 500).astype(np.float32)
    wall = np.stack([t, np.zeros_like(t), np.zeros_like(t)], 1)
    wall2 = np.stack([np.zeros_like(t), t, np.zeros_like(t)], 1)
    tgt = np.concatenate([wall, wall2])
    tgt[:, :2] += rng.normal(scale=0.01, size=(1000, 2)).astype(np.float32)
    src = tgt - np.float32([0.1, 0.05, 0.0])
    ps, pt = tmp_path / "src.pcd", tmp_path / "tgt.pcd"
    save_pcd(ps, from_numpy(src))
    save_pcd(pt, from_numpy(tgt))
    out = str(tmp_path / "aligned.pcd")
    assert main([str(ps), str(pt), out, "-grid", "0.7"]) == 0
    aligned = np.asarray(load_pcd(out).xyz)
    err = np.linalg.norm(aligned[:, :2] - tgt[:, :2], axis=1)
    assert np.median(err) < 0.06


def test_marching_cubes_tool(surface_pcd, tmp_path):
    from pcl_tpu.tools.marching_cubes_reconstruction import main
    out = str(tmp_path / "mesh.ply")
    assert main([surface_pcd, out, "-grid_res", "24"]) == 0
    assert (tmp_path / "mesh.ply").stat().st_size > 100


def test_gp3_tool(surface_pcd, tmp_path):
    from pcl_tpu.tools.gp3_surface import main
    out = str(tmp_path / "mesh.vtk")
    assert main([surface_pcd, out, "-radius", "0.4"]) == 0
    assert (tmp_path / "mesh.vtk").stat().st_size > 100


def test_concatenate_tool(small_pcd, tmp_path):
    from pcl_tpu.tools.concatenate_points_pcd import main
    out = str(tmp_path / "cat.pcd")
    assert main([small_pcd, small_pcd, out]) == 0
    assert int(load_pcd(out).count) == 2 * int(load_pcd(small_pcd).count)


def test_plane_projection_tool(tmp_path, rng):
    from pcl_tpu.tools.plane_projection import main
    u = rng.uniform(-1, 1, size=(300, 2)).astype(np.float32)
    xyz = np.column_stack([u, 0.01 * rng.normal(size=300).astype(np.float32)])
    p = tmp_path / "p.pcd"
    save_pcd(p, from_numpy(xyz.astype(np.float32)))
    out = str(tmp_path / "proj.pcd")
    assert main([str(p), out, "-thresh", "0.05"]) == 0
    z = np.asarray(load_pcd(out).xyz)[:, 2]
    assert np.abs(z).max() < 0.02  # flattened onto the plane
