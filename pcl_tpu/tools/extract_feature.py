"""CLI: generic feature extraction dispatcher
(reference: tools/extract_feature.cpp — pick a descriptor by name, compute it
over the cloud, write the signatures)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Compute a named feature over a cloud")
    ap.add_argument("input")
    ap.add_argument("output", help=".npy descriptor matrix output")
    ap.add_argument("-feature", default="fpfh",
                    choices=["normal", "pfh", "fpfh", "vfh", "esf", "shot"])
    ap.add_argument("-k", type=int, default=16, help="neighbors")
    ap.add_argument("-radius", type=float, default=0.1, help="SHOT radius")
    args = ap.parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from pcl_tpu import io, features
    c = io.load(args.input)
    if args.feature != "esf":
        c = features.estimate_normals(c, k=max(args.k, 8))
    if args.feature == "normal":
        desc = c.attrs["normal"]
    elif args.feature == "pfh":
        desc = features.estimate_pfh(c, k=args.k)
    elif args.feature == "fpfh":
        desc = features.estimate_fpfh(c, k=args.k)
    elif args.feature == "vfh":
        desc = features.estimate_vfh(c)[None]
    elif args.feature == "esf":
        desc = features.estimate_esf(c)[None]
    else:
        desc = features.estimate_shot(c, radius=args.radius, k=args.k)
    d = np.asarray(desc)
    if d.ndim == 2 and d.shape[0] == c.capacity:
        d = d[np.asarray(c.mask)]
    np.save(args.output, d)
    print(f"[extract_feature] {args.feature}: {d.shape} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
