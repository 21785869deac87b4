"""CLI: full ObjRecRANSAC recognition — detect a model in a scene
(reference: tools/obj_rec_ransac_result.cpp — runs recognize() and shows the
best hypotheses; here: prints the best transform + support, optionally writes
the aligned model)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="ObjRecRANSAC: model-in-scene detection")
    ap.add_argument("model"); ap.add_argument("scene")
    ap.add_argument("-pair_width", type=float, default=0.15,
                    help="oriented point pair sampling distance")
    ap.add_argument("-hypotheses", type=int, default=256)
    ap.add_argument("-inlier_dist", type=float, default=0.05)
    ap.add_argument("-output", help="write the aligned model cloud here")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io, features
    from pcl_tpu.core.transforms import transform_cloud
    from pcl_tpu.recognition.orr import obj_rec_ransac
    import jax.numpy as jnp
    model = io.load(args.model)
    scene = io.load(args.scene)
    if "normal" not in model.attrs:
        model = features.estimate_normals(model, k=16)
    if "normal" not in scene.attrs:
        scene = features.estimate_normals(scene, k=16)
    T, support = obj_rec_ransac(
        model, scene, pair_dist=args.pair_width,
        n_hypotheses=args.hypotheses, inlier_dist=args.inlier_dist)
    np.set_printoptions(precision=6, suppress=True)
    print(f"[obj_rec_ransac_result] support={support:.3f}")
    print(np.asarray(T))
    if args.output:
        io.save(args.output, transform_cloud(jnp.asarray(T), model))
    return 0


if __name__ == "__main__":
    sys.exit(main())
