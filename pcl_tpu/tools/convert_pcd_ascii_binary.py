"""CLI: re-encode a PCD as ascii / binary / binary_compressed
(reference: tools/convert_pcd_ascii_binary.cpp — argv[3] in {0,1,2})."""
import argparse, sys

_MODES = {"0": "ascii", "1": "binary", "2": "binary_compressed",
          "ascii": "ascii", "binary": "binary",
          "binary_compressed": "binary_compressed"}


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert PCD between ascii(0)/binary(1)/binary_compressed(2)")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("mode", choices=sorted(_MODES),
                    help="0=ascii 1=binary 2=binary_compressed")
    args = ap.parse_args(argv)
    from pcl_tpu import io
    c = io.load_pcd(args.input)
    io.save_pcd(args.output, c, data=_MODES[args.mode])
    print(f"[convert_pcd_ascii_binary] wrote {args.output} "
          f"({_MODES[args.mode]}, {int(c.count)} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
