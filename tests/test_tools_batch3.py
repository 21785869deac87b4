"""Smoke tests for the round-2 CLI tranche (converters, ObjRecRANSAC family,
headless viewers, grabber replays, TIFF)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import from_numpy, make_cloud
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


@pytest.fixture
def mesh_ply(tmp_path):
    from pcl_tpu.io import ply
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    p = tmp_path / "mesh.ply"
    ply.save(p, from_numpy(verts), faces=faces)
    return str(p)


def test_convert_pcd_ascii_binary(small_pcd, tmp_path):
    from pcl_tpu.tools.convert_pcd_ascii_binary import main
    out = str(tmp_path / "a.pcd")
    assert main([small_pcd, out, "0"]) == 0
    assert main([out, str(tmp_path / "b.pcd"), "2"]) == 0
    from pcl_tpu.io import load_pcd
    c = load_pcd(str(tmp_path / "b.pcd"))
    assert int(c.count) == 300


def test_converter(small_pcd, tmp_path):
    from pcl_tpu.tools.converter import main
    assert main([small_pcd, str(tmp_path / "o.ply"), "-f", "ascii"]) == 0
    assert main([str(tmp_path / "o.ply"), str(tmp_path / "o.pcd"),
                 "-f", "binary_compressed"]) == 0


def test_iterative_closest_point(tmp_path, rng):
    xyz = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    src, tgt = tmp_path / "s.pcd", tmp_path / "t.pcd"
    save_pcd(src, from_numpy(xyz))
    save_pcd(tgt, from_numpy(xyz + np.float32([0.05, 0, 0])))
    from pcl_tpu.tools.iterative_closest_point import main
    out = str(tmp_path / "aligned.pcd")
    assert main([str(src), str(tgt), out, "-iters", "15"]) == 0
    assert os.path.exists(out)


def test_ply2obj_ply2raw(mesh_ply, tmp_path):
    from pcl_tpu.tools.ply2obj import main as ply2obj
    from pcl_tpu.tools.ply2raw import main as ply2raw
    obj = str(tmp_path / "m.obj")
    raw = str(tmp_path / "m.raw")
    assert ply2obj([mesh_ply, obj]) == 0
    assert "f 1 2 3" in open(obj).read()
    assert ply2raw([mesh_ply, raw]) == 0
    assert len(open(raw).read().splitlines()) == 2


def test_sac_segmentation_plane(plane_pcd, tmp_path):
    from pcl_tpu.tools.sac_segmentation_plane import main
    out = str(tmp_path / "plane_only.pcd")
    assert main([plane_pcd, out, "-thresh", "0.02"]) == 0
    from pcl_tpu.io import load_pcd
    assert int(load_pcd(out).count) >= 300


def test_timed_trigger(capsys):
    from pcl_tpu.tools.timed_trigger_test import main
    assert main(["-interval", "0.02", "-duration", "0.15"]) == 0
    assert "firings" in capsys.readouterr().out


def test_crf_segmentation(tmp_path, rng):
    # two separated blobs with some labels flipped; CRF should fix most
    a = rng.normal(size=(80, 3)).astype(np.float32) * 0.05
    b = a + np.float32([2, 0, 0])
    xyz = np.concatenate([a, b])
    labels = np.array([0] * 80 + [1] * 80, np.int32)
    flip = rng.choice(160, 12, replace=False)
    labels[flip] = 1 - labels[flip]
    c = from_numpy(xyz).with_attrs(label=jnp.asarray(labels))
    p = tmp_path / "lab.pcd"
    save_pcd(p, c)
    from pcl_tpu.tools.crf_segmentation import main
    out = str(tmp_path / "ref.pcd")
    assert main([str(p), out, "-sxyz", "0.2"]) == 0
    from pcl_tpu.io import load_pcd
    lab = np.asarray(load_pcd(out).attrs["label"])[:160]
    true = np.array([0] * 80 + [1] * 80)
    # CRF may globally swap nothing (unary anchors it); most flips healed
    assert (lab == true).mean() > 0.9


def test_extract_feature(small_pcd, tmp_path):
    from pcl_tpu.tools.extract_feature import main
    for feat in ["fpfh", "vfh"]:
        out = str(tmp_path / f"{feat}.npy")
        assert main([small_pcd, out, "-feature", feat, "-k", "8"]) == 0
        assert os.path.exists(out)


@pytest.fixture
def bunny_like(tmp_path, rng):
    """Model + scene = model shifted, both surfaces (sphere caps)."""
    u = rng.normal(size=(400, 3)).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    model = u * 0.5
    scene = model + np.float32([0.3, 0.1, 0.0])
    mp, sp = tmp_path / "model.pcd", tmp_path / "scene.pcd"
    save_pcd(mp, from_numpy(model))
    save_pcd(sp, from_numpy(scene))
    return str(mp), str(sp)


def test_obj_rec_ransac_opps_and_hash(bunny_like, tmp_path):
    mp, sp = bunny_like
    from pcl_tpu.tools.obj_rec_ransac_model_opps import main as mopps
    from pcl_tpu.tools.obj_rec_ransac_scene_opps import main as sopps
    from pcl_tpu.tools.obj_rec_ransac_hash_table import main as ht
    out = str(tmp_path / "pairs.pcd")
    assert mopps([mp, "-pair_width", "0.5", "-pairs", "64",
                  "-output", out]) == 0
    assert sopps([sp, "-pair_width", "0.5", "-pairs", "64"]) == 0
    hist = str(tmp_path / "hash.npy")
    assert ht([mp, "-pair_width", "0.5", "-pairs", "256", "-bins", "8",
               "-output", hist]) == 0
    assert np.load(hist).shape == (8, 8, 8)


def test_obj_rec_ransac_octree_tools(small_pcd, tmp_path):
    from pcl_tpu.tools.obj_rec_ransac_orr_octree import main as octree
    from pcl_tpu.tools.obj_rec_ransac_orr_octree_zprojection import main as zproj
    html = str(tmp_path / "oct.html")
    assert octree([small_pcd, "-leaf", "0.3", "-html", html]) == 0
    assert os.path.exists(html)
    pgm = str(tmp_path / "z.pgm")
    assert zproj([small_pcd, pgm, "-leaf", "0.3"]) == 0
    assert open(pgm, "rb").read(2) == b"P5"


@pytest.mark.slow
def test_obj_rec_ransac_result(bunny_like, tmp_path):
    mp, sp = bunny_like
    from pcl_tpu.tools.obj_rec_ransac_result import main
    out = str(tmp_path / "aligned.pcd")
    assert main([mp, sp, "-pair_width", "0.5", "-hypotheses", "64",
                 "-inlier_dist", "0.1", "-output", out]) == 0
    assert os.path.exists(out)


@pytest.mark.slow
def test_obj_rec_ransac_accepted_hypotheses(bunny_like):
    mp, sp = bunny_like
    from pcl_tpu.tools.obj_rec_ransac_accepted_hypotheses import main
    assert main([mp, sp, "-pair_width", "0.5", "-hypotheses", "64",
                 "-accept", "0.0"]) == 0


def test_pcd_viewer(small_pcd, tmp_path, capsys):
    from pcl_tpu.tools.pcd_viewer import main
    html = str(tmp_path / "v.html")
    assert main([small_pcd, small_pcd, "-html", html, "-ascii"]) == 0
    assert os.path.exists(html)
    assert "bbox" in capsys.readouterr().out


def test_image_viewer(tmp_path, rng):
    depth = rng.uniform(0.5, 2.0, size=(24, 32)).astype(np.float32)
    from pcl_tpu.fusion.tsdf import depth_to_vertex_map, Intrinsics
    vm = depth_to_vertex_map(jnp.asarray(depth), Intrinsics(20.0, 20.0, 16.0, 12.0))
    c = make_cloud(vm.reshape(-1, 3), width=32, height=24)
    c = c.with_attrs(rgb=jnp.asarray(rng.uniform(size=(24 * 32, 3)).astype(np.float32)))
    p = tmp_path / "org.pcd"
    save_pcd(p, c)
    from pcl_tpu.tools.image_viewer import main
    rgb_out, d_out = str(tmp_path / "c.png"), str(tmp_path / "d.png")
    assert main([str(p), "-rgb", rgb_out, "-depth", d_out]) == 0
    assert os.path.exists(rgb_out) and os.path.exists(d_out)


def test_pcd_grabber_viewer(small_pcd, tmp_path):
    from pcl_tpu.tools.pcd_grabber_viewer import main
    html = str(tmp_path / "g.html")
    assert main([small_pcd, "-html", html]) == 0
    assert os.path.exists(html)


def test_image_grabber_tools(tmp_path, rng):
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(3):
        np.save(d / f"f{i}.npy", rng.uniform(0.5, 2.0, size=(16, 20)).astype(np.float32))
    from pcl_tpu.tools.image_grabber_viewer import main as viewer
    from pcl_tpu.tools.image_grabber_saver import main as saver
    assert viewer([str(d), "-focal", "15"]) == 0
    out = tmp_path / "pcds"
    assert saver([str(d), str(out), "-focal", "15"]) == 0
    assert len(list(out.glob("*.pcd"))) == 3


def test_velodyne_viewer_tools(tmp_path, rng):
    from pcl_tpu.io import velodyne
    # synthesize two revolutions of VLP16 packets
    pkts = []
    for rev in range(2):
        for az0 in range(0, 360, 24):
            pkts.append(velodyne.encode_packet(
                np.arange(12, dtype=np.float32) * 2 + az0,
                rng.uniform(2.0, 20.0, size=(12, 32)).astype(np.float32),
                np.full((12, 32), 40.0, np.float32)))
    pcap = str(tmp_path / "t.pcap")
    velodyne.write_pcap(pcap, pkts)
    from pcl_tpu.tools.vlp_viewer import main as vlp
    from pcl_tpu.tools.hdl_grabber_example import main as hdl_ex
    html = str(tmp_path / "sweep.html")
    assert vlp([pcap, "-html", html]) == 0
    assert os.path.exists(html)
    assert hdl_ex([pcap, "-model", "VLP16", "-timeout", "3"]) == 0


def test_registration_visualizer(tmp_path, rng):
    xyz = rng.uniform(-1, 1, size=(150, 3)).astype(np.float32)
    src, tgt = tmp_path / "s.pcd", tmp_path / "t.pcd"
    save_pcd(src, from_numpy(xyz))
    save_pcd(tgt, from_numpy(xyz + np.float32([0.05, 0.02, 0])))
    from pcl_tpu.tools.registration_visualizer import main
    out = str(tmp_path / "viz")
    assert main([str(src), str(tgt), out, "-iters", "6", "-stages", "2"]) == 0
    assert os.path.exists(os.path.join(out, "stage_001.svg"))
    assert os.path.exists(os.path.join(out, "mse.svg"))


def test_tiff_roundtrip_and_tiff2pcd(tmp_path, rng):
    from pcl_tpu.io.tiff import load_tiff, save_tiff
    g16 = (rng.uniform(100, 4000, size=(10, 14))).astype(np.uint16)
    p = str(tmp_path / "d.tif")
    save_tiff(p, g16)
    assert np.array_equal(load_tiff(p), g16)
    rgb = (rng.uniform(0, 255, size=(10, 14, 3))).astype(np.uint8)
    p2 = str(tmp_path / "c.tif")
    save_tiff(p2, rgb)
    assert np.array_equal(load_tiff(p2), rgb)

    d = tmp_path / "depth"
    d.mkdir()
    save_tiff(str(d / "f0.tif"), g16)
    rgbd = tmp_path / "rgb"
    rgbd.mkdir()
    save_tiff(str(rgbd / "f0.tif"), rgb)
    from pcl_tpu.tools.tiff2pcd import main
    out = tmp_path / "out"
    assert main([str(d), str(out), "-rgb_dir", str(rgbd), "-focal", "10"]) == 0
    from pcl_tpu.io import load_pcd
    c = load_pcd(str(out / "frame_000000.pcd"))
    assert c.width == 14 and c.height == 10
    assert "rgb" in c.attrs
