"""CLI: euclidean cluster extraction (reference: tools/cluster_extraction.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Extract euclidean clusters")
    ap.add_argument("input")
    ap.add_argument("-tolerance", type=float, default=0.02)
    ap.add_argument("-min_size", type=int, default=100)
    ap.add_argument("-max_size", type=int, default=1 << 30)
    ap.add_argument("-prefix", default="cluster_", help="output PCD prefix")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io, segmentation
    c = io.load(args.input)
    labels, n = segmentation.euclidean_clusters(
        c, args.tolerance, min_cluster_size=args.min_size,
        max_cluster_size=args.max_size)
    labels = np.asarray(labels)
    kept = sorted(set(labels[labels >= 0].tolist()))
    print(f"[cluster_extraction] {len(kept)} clusters (of {int(n)} components)")
    import jax.numpy as jnp
    for i, lab in enumerate(kept):
        sel = labels == lab
        print(f"  cluster {i}: {sel.sum()} points")
        if args.write:
            io.save(f"{args.prefix}{i}.pcd", c.with_mask(jnp.asarray(sel)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
