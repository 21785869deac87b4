"""CLI: decompress an LZF-compressed binary blob of a PCD body
(reference: tools/pclzf2pcd.cpp — PCLZF-stored frames back to PCD)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Re-encode a binary_compressed PCD as plain binary")
    ap.add_argument("input"); ap.add_argument("output")
    args = ap.parse_args(argv)
    from pcl_tpu.io import pcd as pcd_io
    c = pcd_io.load(args.input)
    pcd_io.save(args.output, c, data="binary")
    print(f"[pclzf2pcd] {int(c.count)} points re-encoded as binary")
    return 0


if __name__ == "__main__":
    sys.exit(main())
