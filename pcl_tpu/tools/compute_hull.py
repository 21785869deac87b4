"""CLI: convex/concave hull (reference: tools/compute_hull.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Compute the hull mesh of a cloud")
    ap.add_argument("input"); ap.add_argument("output", help=".ply mesh out")
    ap.add_argument("-alpha", type=float, default=0.0,
                    help=">0 -> concave hull with this alpha")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.surface.hulls import convex_hull, concave_hull
    from pcl_tpu.tools.marching_cubes_reconstruction import _save_mesh
    c = io.load(args.input)
    if args.alpha > 0:
        verts, faces = concave_hull(c, alpha=args.alpha)
    else:
        verts, faces = convex_hull(c, dim=3)
    _save_mesh(args.output, np.asarray(verts, np.float32),
               np.asarray(faces, np.int32))
    print(f"[compute_hull] {int(c.count)} pts -> {len(verts)} verts, "
          f"{len(faces)} facets")
    return 0


if __name__ == "__main__":
    sys.exit(main())
