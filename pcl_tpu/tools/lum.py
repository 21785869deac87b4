"""CLI: LUM GraphSLAM global alignment of multiple scans (reference:
tools/lum.cpp:80-137 — loop detection by centroid distance, inter-scan
correspondences, global solve, write *_out.pcd)."""
import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Globally align multiple scans with a LUM pose graph")
    ap.add_argument("inputs", nargs="+", help="PCD/PLY scans in chain order")
    ap.add_argument("-loop_dist", type=float, default=5.0,
                    help="centroid distance under which two scans form an edge")
    ap.add_argument("-corr_dist", type=float, default=2.5,
                    help="max correspondence distance")
    ap.add_argument("-max_corr", type=int, default=2048,
                    help="correspondence cap per edge")
    ap.add_argument("-iter", type=int, default=5)
    ap.add_argument("-suffix", default="_out")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from pcl_tpu import io, native
    from pcl_tpu.core.transforms import transform_points
    from pcl_tpu.registration.graph import lum, build_edges_from_correspondences

    clouds = [io.load(p) for p in args.inputs]
    pts = [np.asarray(c.xyz)[np.asarray(c.mask)] for c in clouds]
    V = len(clouds)
    cents = np.stack([p.mean(axis=0) for p in pts])

    # edges: consecutive scans + centroid-close loop pairs (tools/lum.cpp:94)
    pairs = []
    for i in range(V):
        for j in range(i + 1, V):
            if j == i + 1 or np.linalg.norm(cents[i] - cents[j]) < args.loop_dist:
                tree = native.KdTree(pts[j])
                sub = pts[i][:: max(1, len(pts[i]) // args.max_corr)][: args.max_corr]
                d2, ii = tree.knn(sub, 1)
                keep = d2[:, 0] <= args.corr_dist ** 2
                if keep.sum() < 10:
                    continue
                pairs.append((i, j, sub[keep], pts[j][ii[keep, 0]]))
                print(f"[lum] edge {i} -> {j}: {int(keep.sum())} correspondences")
    if not pairs:
        print("[lum] no edges found", file=sys.stderr)
        return 1

    es, ed, cs, cd, cv = build_edges_from_correspondences(pairs, args.max_corr)
    poses0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (V, 1, 1))
    res = lum(poses0, es, ed, cs, cd, cv, max_iterations=args.iter)
    print(f"[lum] {len(pairs)} edges, {V} vertices, "
          f"residual {float(res.residual):.6g} after {int(res.iterations)} iters")

    for i, (path, c) in enumerate(zip(args.inputs, clouds)):
        T = res.poses[i]
        out = c.with_xyz(transform_points(T, c.xyz))
        base, ext = os.path.splitext(path)
        io.save(base + args.suffix + (ext or ".pcd"), out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
