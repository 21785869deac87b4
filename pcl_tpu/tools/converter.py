"""CLI: universal format converter with explicit output encoding
(reference: tools/converter.cpp — any of pcd/ply/vtk/obj/ifs in,
pcd/ply out, -f ascii|binary|binary_compressed)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Universal cloud format converter")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-f", "--format", default="binary",
                    choices=["ascii", "binary", "binary_compressed"],
                    help="output encoding (binary_compressed: PCD only)")
    args = ap.parse_args(argv)
    from pcl_tpu import io
    c = io.load(args.input)
    out = args.output.lower()
    if out.endswith(".pcd"):
        io.save(args.output, c, data=args.format)
    elif out.endswith(".ply"):
        io.save(args.output, c, binary=args.format != "ascii")
    else:
        io.save(args.output, c)
    print(f"[converter] {args.input} -> {args.output} "
          f"[{args.format}] ({int(c.count)} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
