"""CLI: concatenate the points of several clouds into one (reference:
tools/concatenate_points_pcd.cpp)."""
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Concatenate clouds (points union)")
    ap.add_argument("inputs", nargs="+", help="input clouds, last arg is the output")
    args = ap.parse_args(argv)
    if len(args.inputs) < 3:
        print("usage: concatenate_points_pcd in1 in2 [...] out", file=sys.stderr)
        return 1
    *ins, out_path = args.inputs

    import functools
    from pcl_tpu import io
    from pcl_tpu.core.cloud import concat

    clouds = [io.load(p) for p in ins]
    out = functools.reduce(concat, clouds)
    io.save(out_path, out)
    print(f"[concatenate] {len(ins)} clouds -> {int(out.count)} points -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
