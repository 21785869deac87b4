"""CLI: sample oriented point pairs from a MODEL cloud
(reference: tools/obj_rec_ransac_model_opps.cpp — visualizes the oriented
point pairs ObjRecRANSAC samples from the model; here: prints pair statistics
and optionally writes the pair endpoints as a cloud)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Model oriented point pair sampling")
    ap.add_argument("model")
    ap.add_argument("-pair_width", type=float, default=0.15)
    ap.add_argument("-pairs", type=int, default=256)
    ap.add_argument("-output", help="write pair endpoint cloud here")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io, features
    from pcl_tpu.core.cloud import from_numpy
    from pcl_tpu.recognition.orr import sample_oriented_point_pairs
    c = io.load(args.model)
    if "normal" not in c.attrs:
        c = features.estimate_normals(c, k=16)
    i1, i2, valid = sample_oriented_point_pairs(
        c, args.pair_width, n_pairs=args.pairs)
    i1, i2, valid = np.asarray(i1), np.asarray(i2), np.asarray(valid)
    xyz = np.asarray(c.xyz)
    d = np.linalg.norm(xyz[i2[valid]] - xyz[i1[valid]], axis=-1)
    print(f"[obj_rec_ransac_model_opps] {int(valid.sum())}/{args.pairs} pairs "
          f"at width {args.pair_width} "
          f"(measured {d.mean():.4f} +- {d.std():.4f})" if valid.any()
          else f"[obj_rec_ransac_model_opps] 0/{args.pairs} pairs — "
               f"no partners at width {args.pair_width}")
    if args.output and valid.any():
        pts = np.concatenate([xyz[i1[valid]], xyz[i2[valid]]])
        io.save(args.output, from_numpy(pts.astype(np.float32)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
