"""CLI: progressive morphological ground extraction
(reference: tools/progressive_morphological_filter.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Extract ground returns from LiDAR")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-cell_size", type=float, default=1.0)
    ap.add_argument("-max_window", type=int, default=33)
    ap.add_argument("-slope", type=float, default=1.0)
    ap.add_argument("-initial_distance", type=float, default=0.15)
    ap.add_argument("-max_distance", type=float, default=3.0)
    ap.add_argument("--extract_negative", action="store_true",
                    help="keep non-ground instead")
    args = ap.parse_args(argv)
    import dataclasses
    from pcl_tpu import io
    from pcl_tpu.core.cloud import compact
    from pcl_tpu.filters.morphological import progressive_morphological_filter
    c = io.load(args.input)
    ground = progressive_morphological_filter(
        c, cell_size=args.cell_size, max_window_size=args.max_window,
        slope=args.slope, initial_distance=args.initial_distance,
        max_distance=args.max_distance)
    keep = ~ground if args.extract_negative else ground
    out = compact(dataclasses.replace(c, mask=c.mask & keep))
    io.save(args.output, out)
    print(f"[pmf] {int(c.count)} -> {int(out.count)} "
          f"({'non-ground' if args.extract_negative else 'ground'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
