"""Tests — Velodyne pcap grabber, PFHRGB/CPPF color features, MLS
upsampling modes, RBF marching cubes."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud, ATTR_NORMAL
from pcl_tpu.io.velodyne import (
    decode_packet,
    encode_packet,
    write_pcap,
    PcapVelodyneGrabber,
    VLP16_VERT_ANGLES,
)
from pcl_tpu.features import estimate_pfhrgb, estimate_cppf
from pcl_tpu.surface import (
    mls_project,
    mls_distinct_cloud,
    mls_upsample_local_plane,
    mls_upsample_voxel_dilation,
    marching_cubes_rbf,
)


class TestVelodyne:
    def _packet(self, az0=0.0, dist=10.0):
        az = np.array([az0 + 2 * i for i in range(12)], np.float32)
        d = np.full((12, 32), dist, np.float32)
        i = np.full((12, 32), 99.0, np.float32)
        return encode_packet(az, d, i)

    def test_decode_geometry(self):
        pkt = self._packet(az0=0.0, dist=10.0)
        xyz, inten, az = decode_packet(pkt, "VLP16")
        assert len(xyz) == 12 * 32
        assert (inten == 99.0).all()
        r = np.linalg.norm(xyz, axis=1)
        np.testing.assert_allclose(r, 10.0, atol=0.02)
        # a laser at +15 deg elevation must have z = 10*sin(15deg)
        z15 = 10.0 * np.sin(np.deg2rad(15.0))
        assert np.abs(xyz[:, 2] - z15).min() < 0.02

    def test_pcap_sweeps(self, tmp_path):
        pkts = [self._packet(az0=a, dist=5.0) for a in range(0, 360, 24)]
        pkts += [self._packet(az0=a, dist=5.0) for a in range(0, 360, 24)]
        p = str(tmp_path / "rec.pcap")
        write_pcap(p, pkts)
        g = PcapVelodyneGrabber(p, model="VLP16")
        sweeps = list(g._sweeps())
        assert len(sweeps) == 2
        c = sweeps[0]
        m = np.asarray(c.mask)
        assert m.sum() == 15 * 12 * 32
        assert "intensity" in c.attrs


class TestColorFeatures:
    def test_pfhrgb_shape_and_color_sensitivity(self, rng):
        pts = rng.uniform(0, 1, (60, 3)).astype(np.float32)
        nrm = np.tile([0, 0, 1.0], (60, 1)).astype(np.float32)
        rgb_a = np.tile([1.0, 0, 0], (60, 1)).astype(np.float32)
        rgb_b = rng.uniform(0, 1, (60, 3)).astype(np.float32)
        ca = make_cloud(jnp.asarray(pts)).with_attrs(
            normal=jnp.asarray(nrm), rgb=jnp.asarray(rgb_a))
        cb = make_cloud(jnp.asarray(pts)).with_attrs(
            normal=jnp.asarray(nrm), rgb=jnp.asarray(rgb_b))
        fa = np.asarray(estimate_pfhrgb(ca, k=8))
        fb = np.asarray(estimate_pfhrgb(cb, k=8))
        assert fa.shape == (60, 250)
        # geometry half identical, color half differs
        np.testing.assert_allclose(fa[:, :125], fb[:, :125], atol=1e-4)
        assert np.abs(fa[:, 125:] - fb[:, 125:]).max() > 1.0

    def test_cppf_rows(self, rng):
        pts = rng.uniform(0, 1, (30, 3)).astype(np.float32)
        nrm = rng.normal(size=(30, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        rgb = rng.uniform(0, 1, (30, 3)).astype(np.float32)
        c = make_cloud(jnp.asarray(pts)).with_attrs(
            normal=jnp.asarray(nrm), rgb=jnp.asarray(rgb))
        rows = np.asarray(estimate_cppf(c, k=5))
        assert rows.shape == (30, 5, 10)
        assert np.isfinite(rows).all()


class TestMLSUpsampling:
    def _plane(self, rng, n=400):
        u = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        pts = np.concatenate([u, np.zeros((n, 1), np.float32)], 1)
        return make_cloud(jnp.asarray(pts))

    def test_project_distinct(self, rng):
        c = self._plane(rng)
        q = rng.uniform(-0.5, 0.5, (50, 3)).astype(np.float32)
        q[:, 2] = rng.normal(scale=0.2, size=50)
        proj, nrm, ok = mls_project(c, jnp.asarray(q), search_radius=0.4)
        proj, ok = np.asarray(proj), np.asarray(ok)
        assert ok.mean() > 0.8
        assert np.abs(proj[ok][:, 2]).max() < 0.02
        assert (np.abs(np.asarray(nrm)[ok][:, 2]) > 0.99).all()

    def test_distinct_cloud_mode(self, rng):
        c = self._plane(rng)
        q = rng.uniform(-0.5, 0.5, (40, 3)).astype(np.float32)
        q[:, 2] = 0.3
        d = make_cloud(jnp.asarray(q))
        out = mls_distinct_cloud(c, d, search_radius=0.4)
        assert np.abs(np.asarray(out.xyz)[np.asarray(out.mask)][:, 2]).max() < 0.02

    def test_local_plane_upsampling_densifies(self, rng):
        c = self._plane(rng, n=100)
        up = mls_upsample_local_plane(
            c, search_radius=0.5, upsampling_radius=0.15, step_size=0.075
        )
        assert int(np.asarray(up.mask).sum()) > 400
        assert np.abs(np.asarray(up.xyz)[np.asarray(up.mask)][:, 2]).max() < 0.03

    def test_voxel_dilation(self, rng):
        c = self._plane(rng, n=200)
        up = mls_upsample_voxel_dilation(c, search_radius=0.5, voxel_size=0.25)
        pts = np.asarray(up.xyz)[np.asarray(up.mask)]
        assert len(pts) > 50
        assert np.abs(pts[:, 2]).max() < 0.05


class TestRBF:
    def test_sphere(self, rng):
        from pcl_tpu import features
        d = rng.normal(size=(500, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        c = make_cloud(jnp.asarray(d))
        c = features.estimate_normals(c, k=10, viewpoint=jnp.zeros(3))
        c = c.with_attrs(normal=-c.attrs[ATTR_NORMAL])
        verts, tris = marching_cubes_rbf(c, resolution=24, max_centers=200)
        assert len(verts) > 50 and len(tris) > 50
        r = np.linalg.norm(verts, axis=1)
        assert (np.abs(r - 1.0) < 0.2).mean() > 0.9
