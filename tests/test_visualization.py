"""Headless visualization export tests."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.visualization import cloud_to_html, mesh_to_html, render_ascii


def test_cloud_to_html(tmp_path, rng):
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    rgb = rng.random((500, 3)).astype(np.float32)
    c = from_numpy(xyz, {"rgb": rgb})
    p = tmp_path / "view.html"
    cloud_to_html(p, c)
    html = p.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert "webgl" in html
    assert "500 points" in html


def test_mesh_to_html(tmp_path, rng):
    verts = rng.normal(size=(30, 3)).astype(np.float32)
    tris = rng.integers(0, 30, size=(40, 3)).astype(np.int32)
    p = tmp_path / "mesh.html"
    mesh_to_html(p, verts, tris)
    assert p.read_text().startswith("<!DOCTYPE html>")


def test_render_ascii(rng):
    # a filled square should produce many shaded characters
    u = rng.uniform(0, 1, size=(2000, 2)).astype(np.float32)
    xyz = np.concatenate([u, u[:, :1]], 1)
    art = render_ascii(from_numpy(xyz), width=40, height=20)
    lines = art.split("\n")
    assert len(lines) == 20
    filled = sum(ch != " " for line in lines for ch in line)
    assert filled > 400
