"""CLI: implicit-surface reconstruction (Hoppe SDF or RBF) to a mesh
(reference: tools/marching_cubes_reconstruction.cpp)."""
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Marching-cubes style reconstruction")
    ap.add_argument("input")
    ap.add_argument("output", help=".ply/.vtk/.ifs mesh output")
    ap.add_argument("-method", choices=("hoppe", "rbf"), default="hoppe")
    ap.add_argument("-grid_res", type=int, default=48)
    ap.add_argument("-k", type=int, default=16, help="normal-estimation neighbors")
    args = ap.parse_args(argv)

    from pcl_tpu import io
    from pcl_tpu.core.cloud import ATTR_NORMAL
    from pcl_tpu.features.normals import estimate_normals
    from pcl_tpu.surface.reconstruction import reconstruct_hoppe
    from pcl_tpu.surface.rbf import marching_cubes_rbf

    c = io.load(args.input)
    if ATTR_NORMAL not in c.attrs:
        c = estimate_normals(c, k=args.k)
    if args.method == "hoppe":
        verts, tris = reconstruct_hoppe(c, resolution=args.grid_res)
    else:
        verts, tris = marching_cubes_rbf(c, resolution=args.grid_res)
    _save_mesh(args.output, verts, tris)
    print(f"[marching_cubes] {args.method}: {len(verts)} vertices, "
          f"{len(tris)} triangles -> {args.output}")
    return 0


def _save_mesh(path, verts, tris):
    import numpy as np
    import jax.numpy as jnp
    from pcl_tpu.core.cloud import Cloud
    from pcl_tpu.io import ply as ply_io
    from pcl_tpu.io.formats_extra import save_ifs, save_vtk

    low = path.lower()
    if low.endswith(".vtk"):
        save_vtk(path, np.asarray(verts), polygons=np.asarray(tris))
    elif low.endswith(".ifs"):
        save_ifs(path, np.asarray(verts), triangles=np.asarray(tris))
    else:
        cloud = Cloud(xyz=jnp.asarray(verts, jnp.float32),
                      mask=jnp.ones((len(verts),), bool))
        ply_io.save(path, cloud, faces=np.asarray(tris))


if __name__ == "__main__":
    sys.exit(main())
