"""CLI: segment a cloud with a trained unary classifier (reference:
tools/unary_classifier_segment.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Per-point classification")
    ap.add_argument("input"); ap.add_argument("codebook", help=".npz from train")
    ap.add_argument("output", help="PCD with label attr")
    ap.add_argument("-k", type=int, default=16)
    ap.add_argument("-fpfh_k", type=int, default=16)
    args = ap.parse_args(argv)
    import dataclasses
    import numpy as np, jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.features.normals import estimate_normals
    from pcl_tpu.features.fpfh import estimate_fpfh
    from pcl_tpu.segmentation.advanced import UnaryClassifier
    c = io.load(args.input)
    cn = estimate_normals(c, k=args.k)
    f = np.asarray(estimate_fpfh(cn, k=args.fpfh_k))
    z = np.load(args.codebook)
    clf = UnaryClassifier()
    clf.centroids = z["centroids"]; clf.class_of = z["class_of"]
    labels = clf.segment(f)
    out = dataclasses.replace(
        c, attrs={**c.attrs, "label": jnp.asarray(labels.astype(np.int32))})
    io.save(args.output, out)
    import collections
    print(f"[unary_classifier_segment] {dict(collections.Counter(labels[np.asarray(c.mask)].tolist()))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
