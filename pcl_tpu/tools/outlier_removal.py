"""CLI: statistical/radius outlier removal (reference: tools/outlier_removal.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Remove outliers")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-method", default="statistical", choices=["statistical", "radius"])
    ap.add_argument("-mean_k", type=int, default=16)
    ap.add_argument("-std_dev_mul", type=float, default=1.0)
    ap.add_argument("-radius", type=float, default=0.05)
    ap.add_argument("-min_pts", type=int, default=2)
    args = ap.parse_args(argv)
    from pcl_tpu import io, filters
    c = io.load(args.input)
    if args.method == "statistical":
        out = filters.statistical_outlier_removal(
            c, mean_k=args.mean_k, stddev_mult=args.std_dev_mul)
    else:
        out = filters.radius_outlier_removal(c, radius=args.radius,
                                             min_neighbors=args.min_pts)
    print(f"[outlier_removal] {int(c.count)} -> {int(out.count)} points")
    io.save(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
