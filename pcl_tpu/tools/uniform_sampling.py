"""CLI: uniform sampling — keep one actual input point per voxel
(reference: tools/uniform_sampling.cpp)."""
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Uniform (keep-one-per-voxel) sampling")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("-radius", type=float, default=0.01, help="voxel size")
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.filters import uniform_sample

    c = io.load(args.input)
    out = uniform_sample(c, args.radius)
    print(f"[uniform_sampling] {int(c.count)} -> {int(out.count)} points "
          f"(radius {args.radius})")
    io.save(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
