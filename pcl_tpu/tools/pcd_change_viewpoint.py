"""CLI: rewrite the VIEWPOINT of a PCD (reference: tools/pcd_change_viewpoint.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Set the PCD VIEWPOINT header")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("viewpoint", nargs=7, type=float,
                    help="tx ty tz qw qx qy qz")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu.io import pcd as pcd_io
    c = pcd_io.load(args.input)
    pcd_io.save(args.output, c, viewpoint=np.asarray(args.viewpoint, np.float32))
    print(f"[pcd_change_viewpoint] -> {args.viewpoint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
