"""CLI: mesh -> cloud via virtual depth scanning
(reference: tools/mesh2pcd.cpp — renders the mesh from a view sphere and
back-projects the depth buffers)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Convert a mesh to a scanned cloud")
    ap.add_argument("input", help=".ply or .obj mesh"); ap.add_argument("output")
    ap.add_argument("-n_views", type=int, default=16)
    ap.add_argument("-resolution", type=int, default=128)
    ap.add_argument("-dense_samples", type=int, default=200000,
                    help="surface pre-samples backing the z-buffer")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.core.cloud import from_numpy
    from pcl_tpu.tools.virtual_scanner import scan_views
    pts = scan_views(args.input, args.n_views, args.resolution,
                     args.dense_samples)
    io.save(args.output, from_numpy(pts))
    print(f"[mesh2pcd] {args.n_views} views -> {len(pts)} points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
