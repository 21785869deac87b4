"""CLI: Poisson surface reconstruction (reference: tools/poisson_reconstruction.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Poisson indicator-field reconstruction")
    ap.add_argument("input"); ap.add_argument("output", help=".ply mesh out")
    ap.add_argument("-depth", type=int, default=5, help="octree depth (grid 2^depth)")
    ap.add_argument("-k", type=int, default=16, help="normal neighborhood")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.features.normals import estimate_normals
    from pcl_tpu.surface.poisson import poisson_reconstruction
    from pcl_tpu.tools.marching_cubes_reconstruction import _save_mesh
    c = io.load(args.input)
    c = estimate_normals(c, k=args.k)
    verts, faces = poisson_reconstruction(c, depth=args.depth)
    _save_mesh(args.output, np.asarray(verts, np.float32),
               np.asarray(faces, np.int32))
    print(f"[poisson] {int(c.count)} pts -> {len(verts)} verts {len(faces)} tris")
    return 0


if __name__ == "__main__":
    sys.exit(main())
