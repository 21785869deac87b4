"""CLI: per-XY-cell minimum points (reference: tools/grid_min.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Keep the lowest point per XY grid cell")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-resolution", type=float, default=1.0)
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.core.cloud import compact
    from pcl_tpu.filters.extras import grid_minimum
    c = io.load(args.input)
    out = compact(grid_minimum(c, args.resolution))
    io.save(args.output, out)
    print(f"[grid_min] {int(c.count)} -> {int(out.count)} points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
