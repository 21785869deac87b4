"""CLI: format conversion (reference: tools/pcd2ply.cpp, ply2pcd.cpp, obj2pcd...)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Convert between cloud formats (by extension)")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("--ascii", action="store_true", help="write ASCII where supported")
    args = ap.parse_args(argv)
    from pcl_tpu import io
    c = io.load(args.input)
    kw = {}
    if args.output.lower().endswith(".ply"):
        kw["binary"] = not args.ascii
    elif args.output.lower().endswith(".pcd"):
        kw["data"] = "ascii" if args.ascii else "binary_compressed"
    io.save(args.output, c, **kw)
    print(f"[convert] {args.input} -> {args.output} ({int(c.count)} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
