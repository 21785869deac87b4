"""CLI: virtual scanner (reference: tools/virtual_scanner.cpp) — simulate
depth scans of a mesh from viewpoints on a sphere and emit one PCD per view
(or a merged cloud)."""
import argparse, sys

import numpy as np


def _look_at(eye, center):
    z = center - eye
    z = z / np.linalg.norm(z)
    up = np.float32([0, 0, 1]) if abs(z[2]) < 0.95 else np.float32([0, 1, 0])
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, y, z, eye
    return T


def scan_views(mesh_path, n_views, resolution, dense_samples, seed=0):
    """Render depth from viewpoints on a sphere around the mesh; returns the
    merged back-projected points [N,3] (z-buffer backed by dense surface
    samples — the TPU-side analog of the reference's VTK ray casting)."""
    import jax.numpy as jnp
    from pcl_tpu.core.cloud import from_numpy
    from pcl_tpu.simulation.range_likelihood import render_depth
    from pcl_tpu.fusion.tsdf import Intrinsics, depth_to_vertex_map
    if mesh_path.lower().endswith(".obj"):
        from pcl_tpu.io.obj import load_mesh
    else:
        from pcl_tpu.io.ply import load_mesh
    cloud, faces = load_mesh(mesh_path)
    xyz = np.asarray(cloud.xyz)[np.asarray(cloud.mask)]
    if faces is not None and len(faces):
        tri = xyz[np.asarray(faces)]
        area = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
        rng = np.random.default_rng(seed)
        t = rng.choice(len(tri), size=dense_samples, p=area / area.sum())
        u = rng.random(dense_samples); v = rng.random(dense_samples)
        flip = u + v > 1
        u[flip] = 1 - u[flip]; v[flip] = 1 - v[flip]
        xyz = (tri[t, 0] * (1 - u - v)[:, None] + tri[t, 1] * u[:, None]
               + tri[t, 2] * v[:, None]).astype(np.float32)
    dense = from_numpy(xyz)
    center = xyz.mean(0)
    radius = 2.5 * float(np.linalg.norm(xyz - center, axis=1).max() + 1e-6)
    H = W = int(resolution)
    intr = Intrinsics(fx=W * 0.8, fy=W * 0.8, cx=W / 2 - 0.5, cy=H / 2 - 0.5)
    out = []
    for k in range(n_views):
        phi = np.arccos(1 - 2 * (k + 0.5) / n_views)
        theta = np.pi * (1 + 5 ** 0.5) * k
        eye = center + radius * np.float32([
            np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)])
        pose = _look_at(eye.astype(np.float32), center.astype(np.float32))
        d = np.asarray(render_depth(dense, jnp.asarray(pose), intr, H, W))
        vm = np.asarray(depth_to_vertex_map(jnp.asarray(d), intr))
        pts_cam = vm[d > 0]
        pts_w = pts_cam @ pose[:3, :3].T + pose[:3, 3]
        out.append(pts_w.astype(np.float32))
    return np.concatenate(out, 0) if out else np.zeros((0, 3), np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Simulate scans of a mesh")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-n_views", type=int, default=8)
    ap.add_argument("-resolution", type=int, default=96)
    ap.add_argument("-dense_samples", type=int, default=100000)
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.core.cloud import from_numpy
    pts = scan_views(args.input, args.n_views, args.resolution, args.dense_samples)
    io.save(args.output, from_numpy(pts))
    print(f"[virtual_scanner] {args.n_views} views -> {len(pts)} points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
