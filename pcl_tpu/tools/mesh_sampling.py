"""CLI: sample points from a mesh surface (reference: tools/mesh_sampling.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Uniformly sample a triangle mesh")
    ap.add_argument("input", help=".ply or .obj mesh")
    ap.add_argument("output")
    ap.add_argument("-n_samples", type=int, default=100000)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.core.cloud import from_numpy, to_numpy
    if args.input.lower().endswith(".obj"):
        from pcl_tpu.io.obj import load_mesh
    else:
        from pcl_tpu.io.ply import load_mesh
    cloud, faces = load_mesh(args.input)
    if faces is None or len(faces) == 0:
        raise SystemExit("input has no faces")
    xyz, _ = to_numpy(cloud)
    tri = xyz[np.asarray(faces)]
    # area-weighted triangle sampling + barycentric draws
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    rng = np.random.default_rng(args.seed)
    t = rng.choice(len(tri), size=args.n_samples, p=area / area.sum())
    u = rng.random(args.n_samples); v = rng.random(args.n_samples)
    flip = u + v > 1
    u[flip] = 1 - u[flip]; v[flip] = 1 - v[flip]
    p = (tri[t, 0] * (1 - u - v)[:, None] + tri[t, 1] * u[:, None]
         + tri[t, 2] * v[:, None])
    io.save(args.output, from_numpy(p.astype(np.float32)))
    print(f"[mesh_sampling] {len(tri)} triangles -> {args.n_samples} points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
