"""CLI: voxel-grid downsampling (reference: tools/voxel_grid.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Downsample a cloud with a voxel grid")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-leaf", type=float, default=0.01)
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.filters import voxel_downsample
    from pcl_tpu.core.cloud import compact
    c = io.load(args.input)
    out = voxel_downsample(c, args.leaf)
    print(f"[voxel_grid] {int(c.count)} -> {int(out.count)} points (leaf {args.leaf})")
    io.save(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
