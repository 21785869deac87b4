"""CLI: FPFH descriptors (reference: tools/fpfh_estimation.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Compute FPFH descriptors")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-k", type=int, default=16)
    ap.add_argument("-nk", type=int, default=16, help="normal-estimation k")
    args = ap.parse_args(argv)
    from pcl_tpu import io, features
    c = io.load(args.input)
    c = features.estimate_normals(c, k=args.nk)
    f = features.estimate_fpfh(c, k=args.k)
    out = c.with_attrs(fpfh=f)
    print(f"[fpfh_estimation] {int(out.count)} descriptors (33 bins)")
    io.save(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
