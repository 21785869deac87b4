"""I/O tests (mirrors reference test/io/test_io.cpp strategy: write/read
roundtrips in every encoding + reading the real reference fixtures)."""

import io

import numpy as np
import pytest

from pcl_tpu.core import from_numpy, to_numpy
from pcl_tpu.io import lzf, pcd
from tests.conftest import reference_pcd, REFERENCE_TEST_DIR


class TestLZF:
    def test_roundtrip_random(self, rng):
        data = rng.integers(0, 256, size=10000, dtype=np.uint8).tobytes()
        comp = lzf.compress(data)
        assert lzf.decompress(comp, len(data)) == data

    def test_roundtrip_compressible(self):
        data = b"abcabcabc" * 1000 + b"\x00" * 5000
        comp = lzf.compress(data)
        assert len(comp) < len(data) // 2
        assert lzf.decompress(comp, len(data)) == data

    def test_python_fallback_agrees(self):
        data = b"hello world " * 300 + bytes(range(256)) * 4
        comp = lzf.compress(data)
        assert lzf._decompress_py(comp, len(data)) == data


class TestPCDRoundtrip:
    @pytest.mark.parametrize("encoding", ["ascii", "binary", "binary_compressed"])
    def test_xyz_roundtrip(self, rng, encoding, tmp_path):
        pts = rng.normal(size=(137, 3)).astype(np.float32)
        c = from_numpy(pts, {
            "normal": rng.normal(size=(137, 3)).astype(np.float32),
            "intensity": rng.random(137).astype(np.float32),
        })
        path = tmp_path / f"t_{encoding}.pcd"
        pcd.save(path, c, data=encoding)
        c2 = pcd.load(path)
        xyz1, a1 = to_numpy(c)
        xyz2, a2 = to_numpy(c2)
        tol = 1e-5 if encoding == "ascii" else 0
        np.testing.assert_allclose(xyz2, xyz1, atol=tol)
        np.testing.assert_allclose(a2["normal"], a1["normal"], atol=tol)
        np.testing.assert_allclose(a2["intensity"], a1["intensity"], atol=tol)

    def test_rgb_roundtrip(self, rng, tmp_path):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        rgb = rng.random((50, 3)).astype(np.float32)
        c = from_numpy(pts, {"rgb": rgb})
        path = tmp_path / "rgb.pcd"
        pcd.save(path, c, data="binary")
        c2 = pcd.load(path)
        _, a2 = to_numpy(c2)
        np.testing.assert_allclose(a2["rgb"], rgb, atol=1.0 / 255.0)

    def test_descriptor_field(self, rng, tmp_path):
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        fpfh = rng.random((20, 33)).astype(np.float32)
        c = from_numpy(pts, {"fpfh": fpfh})
        path = tmp_path / "desc.pcd"
        pcd.save(path, c, data="binary_compressed")
        c2 = pcd.load(path)
        _, a2 = to_numpy(c2)
        np.testing.assert_allclose(a2["fpfh"], fpfh)


class TestReferenceFixtures:
    def test_load_bun0_ascii(self):
        c = pcd.load(reference_pcd("bun0.pcd"))
        assert int(c.count) == 397
        xyz, attrs = to_numpy(c)
        assert "normal" in attrs and "curvature" in attrs
        # first point from the file
        np.testing.assert_allclose(
            xyz[0], [0.0054216, 0.11349, 0.040749], rtol=1e-5
        )

    def test_load_milk_binary_compressed(self):
        c = pcd.load(reference_pcd("milk_cartoon_all_small_clorox.pcd"), keep_invalid=True)
        assert c.capacity == 307200
        assert c.is_organized and c.width == 640 and c.height == 480
        xyz, attrs = to_numpy(c, compact=False)
        assert "rgb" in attrs
        # organized cloud has NaN returns -> masked out
        c2 = pcd.load(reference_pcd("milk_cartoon_all_small_clorox.pcd"))
        assert 0 < int(c2.count) < 307200

    def test_load_bunny(self):
        c = pcd.load(reference_pcd("bunny.pcd"))
        assert int(c.count) > 100


class TestPLY:
    def test_roundtrip_binary(self, rng, tmp_path):
        from pcl_tpu.io import ply
        from pcl_tpu.core.cloud import from_numpy, to_numpy
        xyz = rng.normal(size=(120, 3)).astype(np.float32)
        normal = rng.normal(size=(120, 3)).astype(np.float32)
        rgb = rng.random((120, 3)).astype(np.float32)
        c = from_numpy(xyz, {"normal": normal, "rgb": rgb})
        p = tmp_path / "t.ply"
        ply.save(p, c, binary=True)
        c2 = ply.load(p)
        x2, a2 = to_numpy(c2)
        np.testing.assert_allclose(x2, xyz, atol=1e-6)
        np.testing.assert_allclose(a2["normal"], normal, atol=1e-6)
        np.testing.assert_allclose(a2["rgb"], rgb, atol=1.0 / 255)

    def test_roundtrip_ascii(self, rng, tmp_path):
        from pcl_tpu.io import ply
        from pcl_tpu.core.cloud import from_numpy, to_numpy
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        c = from_numpy(xyz)
        p = tmp_path / "t_ascii.ply"
        ply.save(p, c, binary=False)
        x2, _ = to_numpy(ply.load(p))
        np.testing.assert_allclose(x2, xyz, atol=1e-5)

    def test_mesh_faces_roundtrip(self, rng, tmp_path):
        from pcl_tpu.io import ply
        from pcl_tpu.core.cloud import from_numpy
        xyz = rng.normal(size=(10, 3)).astype(np.float32)
        faces = np.array([[0, 1, 2], [2, 3, 4], [5, 6, 7]], np.int32)
        p = tmp_path / "mesh.ply"
        ply.save(p, from_numpy(xyz), binary=True, faces=faces)
        c2, f2 = ply.load_mesh(p)
        np.testing.assert_array_equal(f2, faces)

    def test_reference_fixture(self):
        from pcl_tpu.io import ply
        import os
        # any .ply shipped with the reference test data
        cand = [f for f in os.listdir(REFERENCE_TEST_DIR)
                if f.endswith(".ply")] if os.path.isdir(REFERENCE_TEST_DIR) else []
        if not cand:
            pytest.skip("no reference .ply fixtures")
        c = ply.load(os.path.join(REFERENCE_TEST_DIR, cand[0]))
        assert int(c.count) > 0


class TestOBJ:
    def test_load(self, tmp_path):
        from pcl_tpu.io import obj
        p = tmp_path / "t.obj"
        p.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
vn 0 0 1
f 1/1/1 2/2/2 3/3/3 4/4/4
""")
        c, faces = obj.load_mesh(p)
        assert int(c.count) == 4
        assert faces.shape == (2, 3)  # quad fan-triangulated
        assert "normal" in c.attrs


class TestASCIIXYZ:
    def test_roundtrip(self, rng, tmp_path):
        from pcl_tpu.io import ascii as ascii_io
        from pcl_tpu.core.cloud import from_numpy, to_numpy
        xyz = rng.normal(size=(30, 3)).astype(np.float32)
        p = tmp_path / "t.xyz"
        ascii_io.save(p, from_numpy(xyz))
        x2, _ = to_numpy(ascii_io.load(p))
        np.testing.assert_allclose(x2, xyz, atol=1e-5)


class TestOctreeCompression:
    def test_roundtrip_voxel_centers(self, rng):
        from pcl_tpu.io.compression import compress_cloud, decompress_cloud
        xyz = rng.uniform(0, 2, size=(1500, 3)).astype(np.float32)
        c = from_numpy(xyz)
        res = 0.05
        blob = compress_cloud(c, resolution=res)
        out = decompress_cloud(blob)
        dec, _ = to_numpy(out)
        # every original point is within voxel-diagonal/2 of a decoded
        # center; brute force in chunks to keep memory small
        mins = []
        for i in range(0, len(xyz), 250):
            dd = np.linalg.norm(xyz[i:i+250, None, :] - dec[None, :, :], axis=-1)
            mins.append(dd.min(axis=1))
        mins = np.concatenate(mins)
        assert mins.max() <= res * np.sqrt(3) / 2 + 1e-5

    def test_compression_ratio(self, rng):
        from pcl_tpu.io.compression import compress_cloud
        xyz = rng.uniform(0, 1, size=(5000, 3)).astype(np.float32)
        blob = compress_cloud(from_numpy(xyz), resolution=0.02)
        raw = 5000 * 12
        assert len(blob) < raw / 3   # structural stream beats raw xyz

    def test_empty_and_single(self):
        from pcl_tpu.io.compression import compress_cloud, decompress_cloud
        one = from_numpy(np.array([[1.0, 2.0, 3.0]], np.float32))
        blob = compress_cloud(one, resolution=0.1)
        out = decompress_cloud(blob)
        xyz, _ = to_numpy(out)
        assert len(xyz) == 1
        np.testing.assert_allclose(xyz[0], [1.05, 2.05, 3.05], atol=0.06)


class TestGrabber:
    def test_pcd_grabber_replays_sequence(self, tmp_path, rng):
        from pcl_tpu.io.grabber import PCDGrabber, CloudIterator
        for i in range(3):
            xyz = rng.normal(size=(50 + i, 3)).astype(np.float32)
            pcd.save(tmp_path / f"frame_{i:03d}.pcd", from_numpy(xyz))
        g = PCDGrabber(str(tmp_path))
        frames = []
        g.register_callback(lambda c: frames.append(int(c.count)))
        g.start()
        import time
        for _ in range(100):
            if not g.is_running():
                break
            time.sleep(0.05)
        g.stop()
        assert frames == [50, 51, 52]

    def test_cloud_iterator(self, tmp_path, rng):
        from pcl_tpu.io.grabber import PCDGrabber, CloudIterator
        for i in range(2):
            pcd.save(tmp_path / f"f{i}.pcd",
                     from_numpy(rng.normal(size=(20, 3)).astype(np.float32)))
        it = CloudIterator(PCDGrabber(str(tmp_path)))
        counts = [int(c.count) for c in it]
        assert counts == [20, 20]
