"""CLI: moving-least-squares surface smoothing (reference:
tools/mls_smoothing.cpp)."""
import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="MLS smoothing + normal estimation")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("-radius", type=float, default=0.02, help="search radius")
    ap.add_argument("-polynomial_order", type=int, default=2, choices=(1, 2))
    ap.add_argument("-sqr_gauss_param", type=float, default=None)
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.surface.mls import moving_least_squares

    c = io.load(args.input)
    out = moving_least_squares(
        c, args.radius,
        polynomial_order=args.polynomial_order,
        sqr_gauss_param=args.sqr_gauss_param,
        compute_normals=True,
    )
    io.save(args.output, out)
    print(f"[mls_smoothing] smoothed {int(out.count)} points "
          f"(radius {args.radius}, order {args.polynomial_order})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
