"""CLI: sample oriented point pairs from a SCENE cloud
(reference: tools/obj_rec_ransac_scene_opps.cpp — the scene-side counterpart
of obj_rec_ransac_model_opps)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Scene oriented point pair sampling")
    ap.add_argument("scene")
    ap.add_argument("-pair_width", type=float, default=0.15)
    ap.add_argument("-pairs", type=int, default=256)
    ap.add_argument("-output", help="write pair endpoint cloud here")
    args = ap.parse_args(argv)
    from pcl_tpu.tools.obj_rec_ransac_model_opps import main as opps
    rest = ["-pair_width", str(args.pair_width), "-pairs", str(args.pairs)]
    if args.output:
        rest += ["-output", args.output]
    return opps([args.scene] + rest)


if __name__ == "__main__":
    sys.exit(main())
