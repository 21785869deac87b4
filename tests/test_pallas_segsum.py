"""Chunked segmented-reduce kernel (ops/pallas_segsum.py) — interpret-mode
oracle tests (the kernel itself runs on TPU in production; CI validates the
exact same kernel body through the Pallas interpreter).

Reference behavior matched: VoxelGrid centroid accumulation
(filters/impl/voxel_grid.hpp:597-725 sort -> segment walk).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.ops.pallas_segsum import (
    segment_sum_sorted,
    voxel_centroids_pallas,
)
from pcl_tpu import filters


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("chunk", [128, 256, 512])
@pytest.mark.parametrize("n,p_new", [(1000, 0.3), (4096, 0.05), (700, 0.9)])
def test_segsum_matches_np(rng, chunk, n, p_new):
    steps = (rng.random(n) < p_new).astype(np.int32)
    steps[0] = 0
    seg = np.cumsum(steps).astype(np.int32)
    nvalid = int(n * 0.9)
    vals = rng.normal(size=(n, 4)).astype(np.float32)
    vals[nvalid:] = 0.0
    seg2 = seg.copy()
    seg2[nvalid:] = 2**28
    out = np.asarray(segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(seg2), chunk=chunk, interpret=True))
    ref = np.zeros((seg[nvalid - 1] + 1, 4), np.float32)
    np.add.at(ref, seg[:nvalid], vals[:nvalid])
    np.testing.assert_allclose(out[:len(ref)], ref, rtol=1e-5, atol=1e-5)


def test_segsum_single_segment(rng):
    n = 600
    vals = rng.normal(size=(n, 2)).astype(np.float32)
    seg = np.zeros(n, np.int32)
    out = np.asarray(segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(seg), chunk=256, interpret=True))
    np.testing.assert_allclose(out[0], vals.sum(axis=0), rtol=1e-4)


def test_segsum_every_point_own_segment(rng):
    n = 512
    vals = rng.normal(size=(n, 3)).astype(np.float32)
    seg = np.arange(n, dtype=np.int32)
    out = np.asarray(segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(seg), chunk=128, interpret=True))
    np.testing.assert_allclose(out[:n], vals, rtol=1e-5)


def test_voxel_centroids_parity_with_filter(rng):
    n = 20000
    xyz = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    mask = rng.random(n) < 0.85
    c = Cloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask))
    ref = filters.voxel_downsample(c, 0.05)
    got_c, got_m = voxel_centroids_pallas(c, 0.05, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(got_m))
    gm = np.asarray(got_m)
    np.testing.assert_allclose(np.asarray(got_c)[gm],
                               np.asarray(ref.xyz)[np.asarray(ref.mask)],
                               rtol=1e-5, atol=1e-5)


def test_voxel_tpu_path_attrs_roundtrip(rng, monkeypatch):
    """_voxel_downsample_tpu (attr lanes + dtype restore) against the
    scatter path, with the kernel interpreted."""
    from pcl_tpu.filters import voxel_grid as vg
    from pcl_tpu.ops import pallas_segsum

    n = 8192
    xyz = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    mask = rng.random(n) < 0.9
    attrs = {
        "rgb": jnp.asarray(rng.random((n, 3)).astype(np.float32)),
        "intensity": jnp.asarray(rng.random(n).astype(np.float32)),
    }
    c = Cloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask), attrs=attrs)
    ref = vg._voxel_downsample_xla(c, 0.1, True)

    orig = pallas_segsum.segment_sum_sorted

    def interp(vals, seg, chunk=512, interpret=False):
        return orig(vals, seg, chunk=chunk, interpret=True)

    monkeypatch.setattr(pallas_segsum, "segment_sum_sorted", interp)
    got = vg._voxel_downsample_tpu(c, 0.1, sorted(c.attrs.items()))
    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(got.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_allclose(np.asarray(got.xyz)[m], np.asarray(ref.xyz)[m],
                               rtol=1e-5, atol=1e-6)
    for k in attrs:
        np.testing.assert_allclose(
            np.asarray(got.attrs[k])[m], np.asarray(ref.attrs[k])[m],
            rtol=1e-5, atol=1e-6, err_msg=k)
