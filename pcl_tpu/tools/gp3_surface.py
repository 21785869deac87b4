"""CLI: greedy projection triangulation of an oriented cloud (reference:
tools/gp3_surface.cpp)."""
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Greedy projection triangulation")
    ap.add_argument("input")
    ap.add_argument("output", help=".ply/.vtk/.ifs mesh output")
    ap.add_argument("-radius", type=float, default=0.025, help="search radius")
    ap.add_argument("-mu", type=float, default=2.5)
    ap.add_argument("-k", type=int, default=16, help="max nearest neighbors")
    args = ap.parse_args(argv)

    from pcl_tpu import io
    from pcl_tpu.core.cloud import ATTR_NORMAL
    from pcl_tpu.features.normals import estimate_normals
    from pcl_tpu.surface.triangulation import greedy_projection_triangulation
    from pcl_tpu.tools.marching_cubes_reconstruction import _save_mesh

    c = io.load(args.input)
    if ATTR_NORMAL not in c.attrs:
        c = estimate_normals(c, k=args.k)
    verts, tris = greedy_projection_triangulation(
        c, args.radius, mu=args.mu, k=args.k)
    _save_mesh(args.output, verts, tris)
    print(f"[gp3] {len(verts)} vertices, {len(tris)} triangles -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
