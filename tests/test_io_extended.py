"""IO tests — PNG codec, IFS, VTK, TAR-of-PCDs, organized compression,
range coder, auto-dispatch."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu import io as pio
from pcl_tpu.io.png import (
    save_png,
    load_png,
    save_depth_png,
    load_depth_png,
    save_rgb_png,
    load_rgb_png,
)
from pcl_tpu.io.formats_extra import (
    save_ifs,
    load_ifs,
    save_vtk,
    load_vtk,
    save_tar_pcds,
    load_tar_pcds,
)
from pcl_tpu.io.organized_compression import encode_organized, decode_organized
from pcl_tpu.io import range_coder


class TestPNG:
    def test_gray8_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        p = str(tmp_path / "g8.png")
        save_png(p, img)
        np.testing.assert_array_equal(load_png(p), img)

    def test_gray16_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 65536, (15, 17), dtype=np.uint16)
        p = str(tmp_path / "g16.png")
        save_png(p, img)
        np.testing.assert_array_equal(load_png(p), img)

    def test_rgb_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
        p = str(tmp_path / "rgb.png")
        save_png(p, img)
        np.testing.assert_array_equal(load_png(p), img)

    def test_depth_helpers(self, tmp_path):
        d = np.array([[0.5, 1.234], [0.0, 2.0]], np.float32)
        p = str(tmp_path / "d.png")
        save_depth_png(p, d)
        np.testing.assert_allclose(load_depth_png(p), d, atol=1e-3)


class TestIFS:
    def test_mesh_roundtrip(self, tmp_path, rng):
        v = rng.normal(size=(30, 3)).astype(np.float32)
        t = rng.integers(0, 30, (12, 3)).astype(np.uint32)
        p = str(tmp_path / "m.ifs")
        save_ifs(p, v, t)
        v2, t2 = load_ifs(p)
        np.testing.assert_array_equal(v2, v)
        np.testing.assert_array_equal(t2, t)

    def test_auto_load(self, tmp_path, rng):
        v = rng.normal(size=(10, 3)).astype(np.float32)
        p = str(tmp_path / "c.ifs")
        save_ifs(p, v)
        c = pio.load(p)
        np.testing.assert_allclose(np.asarray(c.xyz)[np.asarray(c.mask)], v)


class TestVTK:
    def test_polydata_roundtrip(self, tmp_path, rng):
        v = rng.normal(size=(20, 3)).astype(np.float32)
        t = rng.integers(0, 20, (7, 3)).astype(np.int32)
        p = str(tmp_path / "m.vtk")
        save_vtk(p, v, t)
        v2, t2 = load_vtk(p)
        np.testing.assert_allclose(v2, v, atol=1e-4)
        np.testing.assert_array_equal(t2, t)

    def test_points_only(self, tmp_path, rng):
        v = rng.normal(size=(8, 3)).astype(np.float32)
        p = str(tmp_path / "c.vtk")
        save_vtk(p, v)
        c = pio.load(p)
        np.testing.assert_allclose(
            np.asarray(c.xyz)[np.asarray(c.mask)], v, atol=1e-4
        )


class TestTar:
    def test_pcd_archive(self, tmp_path, rng):
        clouds = [
            make_cloud(jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)))
            for n in (5, 9, 3)
        ]
        p = str(tmp_path / "seq.tar")
        save_tar_pcds(p, clouds)
        back = load_tar_pcds(p)
        assert len(back) == 3
        for a, b in zip(clouds, back):
            np.testing.assert_allclose(
                np.asarray(a.xyz)[np.asarray(a.mask)],
                np.asarray(b.xyz)[np.asarray(b.mask)],
                atol=1e-5,
            )


class TestOrganizedCompression:
    def test_roundtrip(self, rng):
        H, W = 24, 32
        z = rng.uniform(0.5, 3.0, (H, W)).astype(np.float32)
        valid = rng.uniform(size=(H, W)) > 0.1
        focal = 100.0
        u = np.arange(W, dtype=np.float32) - W / 2
        v = np.arange(H, dtype=np.float32) - H / 2
        xyz = np.stack([u[None] * z / focal, v[:, None] * z / focal, z], -1)
        rgb = rng.uniform(size=(H, W, 3)).astype(np.float32)
        blob = encode_organized(xyz, valid, rgb, focal=focal)
        xyz2, valid2, rgb2 = decode_organized(blob)
        np.testing.assert_array_equal(valid2, valid)
        np.testing.assert_allclose(xyz2[valid], xyz[valid], atol=5e-3)
        np.testing.assert_allclose(rgb2, rgb, atol=1 / 255.0 + 1e-6)

    def test_compresses(self, rng):
        H, W = 32, 32
        z = np.full((H, W), 1.5, np.float32)  # flat depth compresses well
        xyz = np.stack([np.zeros((H, W))] * 2 + [z], -1).astype(np.float32)
        blob = encode_organized(xyz, np.ones((H, W), bool))
        assert len(blob) < H * W * 2 / 4


class TestRangeCoder:
    def test_roundtrip_and_gain(self, rng):
        data = bytes(rng.integers(0, 4, 3000, dtype=np.uint8))
        enc = range_coder.encode(data)
        assert range_coder.decode(enc, len(data)) == data
        assert len(enc) < len(data) * 0.5  # 2-bit symbols entropy ~ 0.25
