"""CLI tool smoke tests — drive each tool's main() on tiny synthetic data
(the tests/ equivalent of the reference's tools being exercised by CI)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.io import save_pcd


@pytest.fixture
def small_pcd(tmp_path, rng):
    xyz = rng.normal(size=(300, 3)).astype(np.float32)
    p = tmp_path / "in.pcd"
    save_pcd(p, from_numpy(xyz))
    return str(p)


@pytest.fixture
def plane_pcd(tmp_path, rng):
    u = rng.uniform(-1, 1, size=(400, 2)).astype(np.float32)
    xyz = np.concatenate([u, np.zeros((400, 1), np.float32)], 1)
    xyz = np.concatenate([xyz, rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)])
    p = tmp_path / "plane.pcd"
    save_pcd(p, from_numpy(xyz))
    return str(p)


def test_voxel_grid(small_pcd, tmp_path):
    from pcl_tpu.tools.voxel_grid import main
    out = str(tmp_path / "out.pcd")
    assert main([small_pcd, out, "-leaf", "0.5"]) == 0


def test_normal_estimation(small_pcd, tmp_path):
    from pcl_tpu.tools.normal_estimation import main
    out = str(tmp_path / "n.pcd")
    assert main([small_pcd, out, "-k", "8"]) == 0
    from pcl_tpu.io import load_pcd
    c = load_pcd(out)
    assert "normal" in c.attrs


def test_fpfh_estimation(small_pcd, tmp_path):
    from pcl_tpu.tools.fpfh_estimation import main
    assert main([small_pcd, str(tmp_path / "f.pcd"), "-k", "8", "-nk", "8"]) == 0


def test_sac_segmentation(plane_pcd, tmp_path):
    from pcl_tpu.tools.sac_segmentation import main
    inl = str(tmp_path / "inl.pcd")
    assert main([plane_pcd, "-model", "plane", "-thresh", "0.02",
                 "-inliers", inl]) == 0
    from pcl_tpu.io import load_pcd
    assert int(load_pcd(inl).count) > 300


def test_outlier_removal(small_pcd, tmp_path):
    from pcl_tpu.tools.outlier_removal import main
    assert main([small_pcd, str(tmp_path / "o.pcd"), "-method", "statistical",
                 "-mean_k", "8"]) == 0


def test_cluster_extraction(tmp_path, rng):
    from pcl_tpu.tools.cluster_extraction import main
    a = rng.normal(scale=0.1, size=(100, 3)).astype(np.float32)
    b = a + 5.0
    p = tmp_path / "two.pcd"
    save_pcd(p, from_numpy(np.concatenate([a, b])))
    assert main([str(p), "-tolerance", "0.5", "-min_size", "10"]) == 0


def test_compute_cloud_error(small_pcd, tmp_path, capsys):
    from pcl_tpu.tools.compute_cloud_error import main
    assert main([small_pcd, small_pcd]) == 0
    outp = capsys.readouterr().out
    assert "rmse=0.000000" in outp


def test_compute_hausdorff(small_pcd, capsys):
    from pcl_tpu.tools.compute_hausdorff import main
    assert main([small_pcd, small_pcd]) == 0
    # the matmul-identity distance has ~1e-3 f32 cancellation noise at 0
    val = float(capsys.readouterr().out.split()[-1])
    assert val < 0.01


def test_add_gaussian_noise(small_pcd, tmp_path):
    from pcl_tpu.tools.add_gaussian_noise import main
    assert main([small_pcd, str(tmp_path / "noisy.pcd"), "-sd", "0.05"]) == 0


def test_convert_pcd_ply_roundtrip(small_pcd, tmp_path):
    from pcl_tpu.tools.convert import main
    ply = str(tmp_path / "c.ply")
    back = str(tmp_path / "back.pcd")
    assert main([small_pcd, ply]) == 0
    assert main([ply, back]) == 0
    from pcl_tpu.io import load_pcd, load
    a = load_pcd(small_pcd); b = load_pcd(back)
    np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz), atol=1e-6)


def test_passthrough(small_pcd, tmp_path):
    from pcl_tpu.tools.passthrough_filter import main
    assert main([small_pcd, str(tmp_path / "p.pcd"), "-field", "z",
                 "-min", "0"]) == 0


def test_mesh_sampling(tmp_path, rng):
    from pcl_tpu.tools.mesh_sampling import main
    from pcl_tpu.io import ply
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    mesh = tmp_path / "mesh.ply"
    ply.save(mesh, from_numpy(verts), binary=True, faces=faces)
    out = str(tmp_path / "sampled.pcd")
    assert main([str(mesh), out, "-n_samples", "500"]) == 0
    from pcl_tpu.io import load_pcd
    c = load_pcd(out)
    assert int(c.count) == 500


def test_ndt3d(tmp_path, rng):
    from pcl_tpu.tools.ndt3d import main
    pts = np.concatenate([
        np.stack([rng.uniform(-2, 2, 300), rng.uniform(-2, 2, 300), np.zeros(300)], 1),
        np.stack([rng.uniform(-2, 2, 200), np.zeros(200), rng.uniform(0, 2, 200)], 1),
    ]).astype(np.float32)
    src = tmp_path / "s.pcd"; tgt = tmp_path / "t.pcd"
    save_pcd(tgt, from_numpy(pts))
    save_pcd(src, from_numpy(pts + np.float32([0.05, -0.03, 0.02])))
    assert main([str(src), str(tgt), "-r", "0.8", "--iters", "15"]) == 0


def test_odometry_tool(tmp_path, rng):
    """Sequence odometry CLI: poses out + ATE against golden (the
    tools/lum.cpp-style multi-scan flow with ATE evaluation)."""
    import numpy as np
    from pcl_tpu.core.cloud import from_numpy
    from pcl_tpu.io import pcd as pcd_io
    from pcl_tpu.registration.trajectory import make_drift_sequence
    from pcl_tpu.tools.odometry import main, _load_poses

    a = rng.uniform(-1, 1, size=(700, 2)).astype(np.float32)
    scene = np.concatenate([
        np.c_[a[:, 0], a[:, 1], 0.05 * np.sin(3 * a[:, 0])],
        np.c_[a[:350, 0], -1 + 0.05 * np.sin(3 * a[:350, 1]), a[:350, 1]],
        np.c_[1 + 0.05 * np.cos(3 * a[:350, 1]), a[:350, 0], a[:350, 1]],
    ]).astype(np.float32)
    scans, golden = make_drift_sequence(scene, 3, rng,
                                        step_translation=0.02,
                                        step_rotation=0.02)
    paths = []
    for i, s in enumerate(scans):
        p = str(tmp_path / f"scan{i}.pcd")
        pcd_io.save(p, from_numpy(s))
        paths.append(p)
    gpath = str(tmp_path / "golden.txt")
    np.savetxt(gpath, golden[:, :3, :4].reshape(len(golden), 12))
    pout = str(tmp_path / "poses.txt")
    rc = main(paths + ["--method", "icp", "--max-corr-dist", "0.3",
                       "--poses-out", pout, "--golden", gpath])
    assert rc == 0
    est = _load_poses(pout)
    assert est.shape == (3, 4, 4)
    err = np.linalg.norm(est[:, :3, 3] - golden[:, :3, 3], axis=1)
    assert err.max() < 5e-3, err
