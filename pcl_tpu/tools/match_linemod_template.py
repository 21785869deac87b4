"""CLI: match a single LINEMOD template against an organized scene
(reference: tools/match_linemod_template.cpp — the one-template counterpart of
linemod_detection.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Match one LINEMOD template")
    ap.add_argument("scene", help="organized PCD with rgb")
    ap.add_argument("template", help=".npz template file")
    ap.add_argument("-threshold", type=float, default=0.6)
    args = ap.parse_args(argv)
    from pcl_tpu.tools.linemod_detection import main as detect
    return detect([args.scene, args.template, "-threshold", str(args.threshold)])


if __name__ == "__main__":
    sys.exit(main())
