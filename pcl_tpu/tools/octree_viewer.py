"""CLI: octree occupancy visualization (reference: tools/octree_viewer.cpp;
headless — exports an interactive HTML view of leaf voxel centroids per
depth level instead of a VTK window)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Export an octree view as HTML")
    ap.add_argument("input"); ap.add_argument("output", help=".html out")
    ap.add_argument("-resolution", type=float, default=0.05)
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.core.cloud import from_numpy
    from pcl_tpu.octree import linear as oct
    from pcl_tpu.visualization.export import cloud_to_html
    c = io.load(args.input)
    tree = oct.build(c.xyz, c.mask, resolution=args.resolution)
    cent, cnt, n_leaves = oct.leaf_centroids(tree, c.xyz)
    cent = np.asarray(cent)[: int(n_leaves)]
    cloud_to_html(args.output, from_numpy(cent.astype(np.float32)))
    print(f"[octree_viewer] {int(c.count)} pts -> {len(cent)} leaves "
          f"@ {args.resolution} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
