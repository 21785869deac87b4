"""CLI: symmetric Hausdorff distance (reference: tools/compute_hausdorff.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Hausdorff distance between clouds")
    ap.add_argument("a"); ap.add_argument("b")
    args = ap.parse_args(argv)
    from pcl_tpu import io
    from pcl_tpu.core.geometry import hausdorff
    ca = io.load(args.a); cb = io.load(args.b)
    h = float(hausdorff(ca.xyz, ca.mask, cb.xyz, cb.mask))
    print(f"[compute_hausdorff] {h:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
