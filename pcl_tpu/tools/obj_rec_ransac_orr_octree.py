"""CLI: build the ObjRecRANSAC scene octree and report / export it
(reference: tools/obj_rec_ransac_orr_octree.cpp — builds an ORROctree and
visualizes the full leaves; here: leaf statistics + optional HTML export of
the leaf centroids)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="ORR octree build + leaf stats")
    ap.add_argument("input")
    ap.add_argument("-leaf", type=float, default=0.05, help="leaf size")
    ap.add_argument("-html", help="export leaf centroids as an HTML viewer")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.octree import linear
    from pcl_tpu.core.cloud import from_numpy
    c = io.load(args.input)
    tree = linear.build(c.xyz, c.mask, args.leaf)
    centroids, counts, n_leaves = linear.leaf_centroids(tree, c.xyz)
    n_leaves = int(n_leaves)
    counts = np.asarray(counts)[:n_leaves]
    print(f"[obj_rec_ransac_orr_octree] {int(c.count)} points -> "
          f"{n_leaves} full leaves at {args.leaf} "
          f"(mean {counts.mean():.1f} pts/leaf, max {int(counts.max())})")
    if args.html:
        from pcl_tpu.visualization.export import cloud_to_html
        cloud_to_html(args.html,
                      from_numpy(np.asarray(centroids)[:n_leaves]))
        print(f"[obj_rec_ransac_orr_octree] wrote {args.html}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
