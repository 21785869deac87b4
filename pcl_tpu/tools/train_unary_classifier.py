"""CLI: train the unary point classifier (reference:
tools/train_unary_classifier.cpp — k-means codebooks of FPFH features per
class)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train a unary classifier")
    ap.add_argument("clouds", nargs="+", help="one PCD per class")
    ap.add_argument("-o", "--output", required=True, help=".npz codebook")
    ap.add_argument("-clusters", type=int, default=8)
    ap.add_argument("-k", type=int, default=16, help="normal neighborhood")
    ap.add_argument("-fpfh_k", type=int, default=16, help="FPFH neighborhood")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.features.normals import estimate_normals
    from pcl_tpu.features.fpfh import estimate_fpfh
    from pcl_tpu.segmentation.advanced import UnaryClassifier
    feats = []
    for path in args.clouds:
        c = io.load(path)
        c = estimate_normals(c, k=args.k)
        f = np.asarray(estimate_fpfh(c, k=args.fpfh_k))
        feats.append(f[np.asarray(c.mask)])
    clf = UnaryClassifier().train(feats, clusters_per_class=args.clusters)
    np.savez(args.output, centroids=clf.centroids, class_of=clf.class_of)
    print(f"[train_unary_classifier] {len(feats)} classes -> "
          f"{len(clf.centroids)} centroids")
    return 0


if __name__ == "__main__":
    sys.exit(main())
