"""CLI: remove local-maximum points (reference: tools/local_max.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Filter points that are local z-maxima")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-radius", type=float, default=1.0)
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.core.cloud import compact
    from pcl_tpu.filters.extras import local_maximum
    c = io.load(args.input)
    out = compact(local_maximum(c, args.radius))
    io.save(args.output, out)
    print(f"[local_max] {int(c.count)} -> {int(out.count)} points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
