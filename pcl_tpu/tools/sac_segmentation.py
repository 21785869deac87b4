"""CLI: robust model segmentation (reference: tools/sac_segmentation_plane.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Segment a geometric model with RANSAC")
    ap.add_argument("input")
    ap.add_argument("-model", default="plane",
                    choices=["plane", "sphere", "line", "circle3d", "stick"])
    ap.add_argument("-thresh", type=float, default=0.01)
    ap.add_argument("-method", default="ransac",
                    choices=["ransac", "msac", "lmeds", "mlesac", "rransac"])
    ap.add_argument("-inliers", help="write inlier cloud here")
    ap.add_argument("-outliers", help="write outlier cloud here")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io, sac, segmentation
    model = {
        "plane": sac.PlaneModel(), "sphere": sac.SphereModel(),
        "line": sac.LineModel(), "circle3d": sac.CircleModel3D(),
        "stick": sac.StickModel(),
    }[args.model]
    c = io.load(args.input)
    res = segmentation.sac_segmentation(c, model, args.thresh, method=args.method)
    np.set_printoptions(precision=6, suppress=True)
    print(f"[sac_segmentation] model={args.model} inliers={int(res.num_inliers)}"
          f"/{int(c.count)} coefficients={np.asarray(res.coefficients)}")
    if args.inliers:
        io.save(args.inliers, c.with_mask(res.inliers))
    if args.outliers:
        io.save(args.outliers, c.with_mask(~res.inliers))
    return 0 if bool(res.valid) else 1


if __name__ == "__main__":
    sys.exit(main())
