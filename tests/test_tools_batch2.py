"""Smoke tests for the round-2 CLI tranche (VERDICT r1 item 7) — each tool's
main() on tiny synthetic data, mirroring the reference tools/ they cite."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import Cloud, from_numpy
from pcl_tpu.io import save_pcd


@pytest.fixture
def small_pcd(tmp_path, rng):
    xyz = rng.normal(size=(300, 3)).astype(np.float32)
    p = tmp_path / "in.pcd"
    save_pcd(p, from_numpy(xyz))
    return str(p)


@pytest.fixture
def surface_pcd(tmp_path, rng):
    u = rng.uniform(-1, 1, size=(600, 2)).astype(np.float32)
    z = 0.2 * np.sin(2 * u[:, 0]) * np.cos(2 * u[:, 1])
    xyz = np.column_stack([u, z]).astype(np.float32)
    p = tmp_path / "surf.pcd"
    save_pcd(p, from_numpy(xyz))
    return str(p)


@pytest.fixture
def organized_pcd(tmp_path):
    H, W = 24, 32
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    z = 1.0 + 0.1 * np.sin(u / 4.0)
    x = (u - W / 2) * z / 30.0
    y = (v - H / 2) * z / 30.0
    xyz = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    c = Cloud(xyz=jnp.asarray(xyz), mask=jnp.ones((H * W,), bool),
              width=W, height=H)
    p = tmp_path / "org.pcd"
    save_pcd(p, c)
    return str(p)


@pytest.fixture
def mesh_ply(tmp_path):
    # a unit tetrahedron
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    from pcl_tpu.io import ply as ply_io
    p = tmp_path / "mesh.ply"
    ply_io.save(str(p), from_numpy(verts), faces=faces)
    return str(p)


def test_vfh_estimation(small_pcd, tmp_path):
    from pcl_tpu.tools.vfh_estimation import main
    out = str(tmp_path / "vfh.npy")
    assert main([small_pcd, out, "-k", "12"]) == 0
    assert np.load(out).shape[-1] == 308


def test_spin_estimation(small_pcd, tmp_path):
    from pcl_tpu.tools.spin_estimation import main
    out = str(tmp_path / "spin.npy")
    assert main([small_pcd, out, "-radius", "0.5", "-k", "12"]) == 0
    assert np.load(out).ndim == 2


def test_boundary_estimation(surface_pcd, tmp_path):
    from pcl_tpu.tools.boundary_estimation import main
    out = str(tmp_path / "b.pcd")
    assert main([surface_pcd, out, "-radius", "0.3"]) == 0


def test_grid_min_local_max(small_pcd, tmp_path):
    from pcl_tpu.tools.grid_min import main as gm
    from pcl_tpu.tools.local_max import main as lm
    assert gm([small_pcd, str(tmp_path / "g.pcd"), "-resolution", "0.5"]) == 0
    assert lm([small_pcd, str(tmp_path / "l.pcd"), "-radius", "0.5"]) == 0


def test_crop_to_hull(small_pcd, tmp_path, rng):
    from pcl_tpu.tools.crop_to_hull import main
    hull = tmp_path / "hull.pcd"
    save_pcd(hull, from_numpy(
        rng.uniform(-0.5, 0.5, size=(50, 3)).astype(np.float32)))
    assert main([small_pcd, str(hull), str(tmp_path / "c.pcd")]) == 0


def test_morph_and_pmf(small_pcd, tmp_path):
    from pcl_tpu.tools.morph import main as morph
    from pcl_tpu.tools.progressive_morphological_filter import main as pmf
    assert morph([small_pcd, str(tmp_path / "m.pcd"), "-operator", "open",
                  "-resolution", "0.5"]) == 0
    assert pmf([small_pcd, str(tmp_path / "p.pcd"), "-cell_size", "0.5"]) == 0


def test_radius_filter(small_pcd, tmp_path):
    from pcl_tpu.tools.radius_filter import main
    assert main([small_pcd, str(tmp_path / "r.pcd"),
                 "-radius", "0.5", "-min_neighbors", "2"]) == 0


def test_fast_bilateral_filter(organized_pcd, tmp_path):
    from pcl_tpu.tools.fast_bilateral_filter import main
    assert main([organized_pcd, str(tmp_path / "fb.pcd")]) == 0


def test_mesh2pcd_and_virtual_scanner(mesh_ply, tmp_path):
    from pcl_tpu.tools.mesh2pcd import main as m2p
    from pcl_tpu.tools.virtual_scanner import main as vs
    assert m2p([mesh_ply, str(tmp_path / "m.pcd"), "-n_views", "4",
                "-resolution", "48", "-dense_samples", "5000"]) == 0
    assert vs([mesh_ply, str(tmp_path / "v.pcd"), "-n_views", "2",
               "-resolution", "32", "-dense_samples", "2000"]) == 0


def test_octree_viewer(small_pcd, tmp_path):
    from pcl_tpu.tools.octree_viewer import main
    out = str(tmp_path / "oct.html")
    assert main([small_pcd, out, "-resolution", "0.5"]) == 0
    assert "html" in open(out).read()[:200].lower()


def test_compute_hull(small_pcd, tmp_path):
    from pcl_tpu.tools.compute_hull import main
    assert main([small_pcd, str(tmp_path / "hull.ply")]) == 0


def test_demean_cloud(small_pcd, tmp_path):
    from pcl_tpu.tools.demean_cloud import main
    out = str(tmp_path / "d.pcd")
    assert main([small_pcd, out]) == 0
    from pcl_tpu.io import load_pcd
    c = load_pcd(out)
    mu = np.asarray(c.xyz)[np.asarray(c.mask)].mean(0)
    assert np.abs(mu).max() < 1e-4


def test_poisson_reconstruction(surface_pcd, tmp_path):
    from pcl_tpu.tools.poisson_reconstruction import main
    assert main([surface_pcd, str(tmp_path / "pois.ply"),
                 "-depth", "5", "-k", "12"]) == 0


def test_bilateral_upsampling(organized_pcd, tmp_path):
    from pcl_tpu.tools.bilateral_upsampling import main
    assert main([organized_pcd, str(tmp_path / "bu.pcd")]) == 0


def test_generate(tmp_path):
    from pcl_tpu.tools.generate import main
    out = str(tmp_path / "gen.pcd")
    assert main([out, "-n", "500", "-distribution", "normal"]) == 0
    from pcl_tpu.io import load_pcd
    assert int(load_pcd(out).count) == 500


def test_pcd_change_viewpoint(small_pcd, tmp_path):
    from pcl_tpu.tools.pcd_change_viewpoint import main
    out = str(tmp_path / "vp.pcd")
    assert main([small_pcd, out, "1", "2", "3", "1", "0", "0", "0"]) == 0
    head = open(out, "rb").read(400).decode("ascii", "replace")
    assert "VIEWPOINT 1 2 3 1 0 0 0" in head


def test_converters(small_pcd, mesh_ply, tmp_path):
    from pcl_tpu.tools.pcd2ply import main as pcd2ply
    from pcl_tpu.tools.ply2pcd import main as ply2pcd
    from pcl_tpu.tools.pcd2vtk import main as pcd2vtk
    ply = str(tmp_path / "a.ply")
    assert pcd2ply([small_pcd, ply]) == 0
    assert ply2pcd([ply, str(tmp_path / "a.pcd")]) == 0
    assert pcd2vtk([small_pcd, str(tmp_path / "a.vtk")]) == 0


def test_png_roundtrip(organized_pcd, tmp_path):
    from pcl_tpu.tools.pcd2png import main as topng
    from pcl_tpu.tools.png2pcd import main as topcd
    png = str(tmp_path / "d.png")
    assert topng([organized_pcd, png]) == 0
    assert topcd([png, str(tmp_path / "back.pcd"), "-fx", "30", "-fy", "30"]) == 0


def test_nan_tools(tmp_path, rng):
    from pcl_tpu.tools.pcd_introduce_nan import main as inject
    from pcl_tpu.tools.pcd_convert_NaN_nan import main as fix
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    p = tmp_path / "in.pcd"
    save_pcd(str(p), from_numpy(xyz), data="ascii")
    out = str(tmp_path / "n.pcd")
    assert inject([str(p), out, "-fraction", "0.3"]) == 0
    # hand-write a NaN-spelled file
    bad = tmp_path / "bad.pcd"
    bad.write_bytes(open(out, "rb").read().replace(b"nan", b"NaN"))
    fixed = str(tmp_path / "f.pcd")
    assert fix([str(bad), fixed]) == 0
    assert b"NaN" not in open(fixed, "rb").read()


def test_plyheader(mesh_ply, capsys):
    from pcl_tpu.tools.plyheader import main
    assert main([mesh_ply]) == 0
    out = capsys.readouterr().out
    assert "element vertex" in out


@pytest.fixture
def organized_rgb_pcd(tmp_path, rng):
    H, W = 32, 40
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    z = 1.0 + 0.2 * ((u > 12) & (u < 26) & (v > 8) & (v < 22))
    x = (u - W / 2) * z / 40.0
    y = (v - H / 2) * z / 40.0
    xyz = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    rgb = np.stack([u / W, v / H, ((u + v) % 7) / 7.0], -1).reshape(-1, 3)
    c = Cloud(xyz=jnp.asarray(xyz), mask=jnp.ones((H * W,), bool),
              width=W, height=H,
              attrs={"rgb": jnp.asarray(rgb.astype(np.float32))})
    p = tmp_path / "orgrgb.pcd"
    save_pcd(p, c)
    return str(p)


def test_linemod_train_and_detect(organized_rgb_pcd, tmp_path):
    from pcl_tpu.tools.train_linemod_template import main as train
    from pcl_tpu.tools.linemod_detection import main as detect
    tpl = str(tmp_path / "t.npz")
    assert train([organized_rgb_pcd, tpl, "-region", "8", "12", "14", "14",
                  "-n_features", "32"]) == 0
    assert detect([organized_rgb_pcd, tpl, "-threshold", "0.5"]) == 0


def test_unary_classifier_tools(small_pcd, tmp_path, rng):
    from pcl_tpu.tools.train_unary_classifier import main as train
    from pcl_tpu.tools.unary_classifier_segment import main as segment
    other = tmp_path / "cl2.pcd"
    xyz = rng.normal(size=(200, 3)).astype(np.float32) * 0.2
    save_pcd(str(other), from_numpy(xyz))
    book = str(tmp_path / "book.npz")
    assert train([small_pcd, str(other), "-o", book, "-clusters", "4"]) == 0
    assert segment([small_pcd, book, str(tmp_path / "seg.pcd")]) == 0


def test_pcap_to_pcd(tmp_path):
    from pcl_tpu.io.velodyne import encode_packet, write_pcap
    from pcl_tpu.tools.pcap_to_pcd import main
    # two synthetic revolutions
    pkts = []
    for rev in range(2):
        for az0 in range(0, 360, 24):
            pkts.append(encode_packet(
                np.arange(12, dtype=np.float32) * 2 + az0,
                np.full((12, 32), 5.0, np.float32),
                np.full((12, 32), 40.0, np.float32)))
    pcap = str(tmp_path / "rev.pcap")
    write_pcap(pcap, pkts)
    assert main([pcap, str(tmp_path / "sweep")]) == 0
    import glob
    assert len(glob.glob(str(tmp_path / "sweep_*.pcd"))) >= 1


def test_pclzf2pcd(small_pcd, tmp_path):
    from pcl_tpu.tools.pclzf2pcd import main
    assert main([small_pcd, str(tmp_path / "plain.pcd")]) == 0


def test_transform_from_viewpoint(small_pcd, tmp_path):
    from pcl_tpu.tools.pcd_change_viewpoint import main as setvp
    from pcl_tpu.tools.transform_from_viewpoint import main as tfv
    vp = str(tmp_path / "vp.pcd")
    assert setvp([small_pcd, vp, "0.5", "0", "0", "1", "0", "0", "0"]) == 0
    out = str(tmp_path / "tf.pcd")
    assert tfv([vp, out]) == 0
    from pcl_tpu.io import load_pcd
    a = np.asarray(load_pcd(vp).xyz)
    b = np.asarray(load_pcd(out).xyz)
    np.testing.assert_allclose(b[:, 0], a[:, 0] + 0.5, atol=1e-5)


def test_voxel_occlusion(tmp_path, rng):
    from pcl_tpu.tools.voxel_grid_occlusion_estimation import main
    # two walls: near wall occludes far wall from origin viewpoint
    yy, zz = np.meshgrid(np.linspace(-0.4, 0.4, 12), np.linspace(-0.4, 0.4, 12))
    near = np.stack([np.full(yy.size, 1.0), yy.ravel(), zz.ravel()], 1)
    far = np.stack([np.full(yy.size, 2.0), yy.ravel() * 0.5, zz.ravel() * 0.5], 1)
    p = tmp_path / "walls.pcd"
    save_pcd(str(p), from_numpy(np.concatenate([near, far]).astype(np.float32)))
    out = str(tmp_path / "vis.pcd")
    assert main([str(p), out, "-leaf", "0.1"]) == 0
    from pcl_tpu.io import load_pcd
    vis = np.asarray(load_pcd(out).xyz)
    # most visible voxels are the near wall
    assert (np.abs(vis[:, 0] - 1.0) < 0.2).mean() > 0.7


def test_icp2d_tool(tmp_path, rng):
    from pcl_tpu.tools.icp2d import main
    t = rng.uniform(0, 2, 300).astype(np.float32)
    pts = np.stack([t, 0.3 * np.sin(3 * t), np.zeros_like(t)], 1)
    src = pts - np.float32([0.05, 0.02, 0])
    ps, pt_ = tmp_path / "s.pcd", tmp_path / "t.pcd"
    save_pcd(str(ps), from_numpy(src))
    save_pcd(str(pt_), from_numpy(pts))
    out = str(tmp_path / "a.pcd")
    assert main([str(ps), str(pt_), out, "-max_dist", "0.3"]) == 0
    from pcl_tpu.io import load_pcd
    aligned = np.asarray(load_pcd(out).xyz)
    err = np.linalg.norm(aligned[:, :2] - pts[:, :2], axis=1)
    assert np.median(err) < 0.02
