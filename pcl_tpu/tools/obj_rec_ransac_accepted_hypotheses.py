"""CLI: list ObjRecRANSAC hypotheses above an acceptance threshold
(reference: tools/obj_rec_ransac_accepted_hypotheses.cpp — shows the accepted
hypotheses sorted by match score)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="ObjRecRANSAC accepted hypotheses")
    ap.add_argument("model"); ap.add_argument("scene")
    ap.add_argument("-pair_width", type=float, default=0.15)
    ap.add_argument("-hypotheses", type=int, default=256)
    ap.add_argument("-inlier_dist", type=float, default=0.05)
    ap.add_argument("-accept", type=float, default=0.1,
                    help="minimum support fraction to accept")
    ap.add_argument("-top", type=int, default=10)
    args = ap.parse_args(argv)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pcl_tpu import io, features
    from pcl_tpu.recognition.orr import _orr_hypotheses, _orr_support
    model = io.load(args.model)
    scene = io.load(args.scene)
    if "normal" not in model.attrs:
        model = features.estimate_normals(model, k=16)
    if "normal" not in scene.attrs:
        scene = features.estimate_normals(scene, k=16)
    key = jax.random.PRNGKey(0)
    T = _orr_hypotheses(
        key, scene.xyz, scene.mask, scene.attrs["normal"],
        model.xyz, model.mask, model.attrs["normal"],
        jnp.float32(args.pair_width), jnp.float32(0.05), args.hypotheses)
    support = np.asarray(_orr_support(
        T, model.xyz, model.mask, scene.xyz, scene.mask,
        jnp.float32(args.inlier_dist)))
    order = np.argsort(-support)
    accepted = [(int(i), float(support[i])) for i in order if support[i] >= args.accept]
    print(f"[obj_rec_ransac_accepted_hypotheses] "
          f"{len(accepted)}/{args.hypotheses} accepted (>= {args.accept})")
    np.set_printoptions(precision=4, suppress=True)
    for i, s in accepted[: args.top]:
        t = np.asarray(T[i][:3, 3])
        print(f"  hyp {i}: support={s:.3f} t={t}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
