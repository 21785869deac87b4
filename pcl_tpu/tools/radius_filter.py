"""CLI: radius outlier removal (reference: tools/radius_filter.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Remove points with few neighbors in r")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-radius", type=float, default=0.1)
    ap.add_argument("-min_neighbors", type=int, default=2)
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.core.cloud import compact
    from pcl_tpu.filters.outliers import radius_outlier_removal
    c = io.load(args.input)
    out = compact(radius_outlier_removal(c, args.radius, args.min_neighbors))
    io.save(args.output, out)
    print(f"[radius_filter] {int(c.count)} -> {int(out.count)} points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
