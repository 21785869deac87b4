"""I/O tests (mirrors reference test/io/test_io.cpp strategy: write/read
roundtrips in every encoding + reading the real reference fixtures)."""

import io

import numpy as np
import pytest

from pcl_tpu.core import from_numpy, to_numpy
from pcl_tpu.io import lzf, pcd
from tests.conftest import reference_pcd


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
