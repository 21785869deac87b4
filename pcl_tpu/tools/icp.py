"""CLI: pairwise ICP registration (reference: tools/icp.cpp).

Usage: python -m pcl_tpu.tools.icp source.pcd target.pcd [-o aligned.pcd]
         [--max-corr-dist D] [--iters N] [--variant point_to_point|point_to_plane]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Align source onto target with ICP")
    ap.add_argument("source")
    ap.add_argument("target")
    ap.add_argument("-o", "--output", help="write aligned source cloud here")
    ap.add_argument("--max-corr-dist", type=float, default=float("inf"))
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--eps", type=float, default=1e-8)
    ap.add_argument("--variant", default="point_to_point",
                    choices=["point_to_point", "point_to_plane", "symmetric"])
    ap.add_argument("--reciprocal", action="store_true")
    args = ap.parse_args(argv)

    from pcl_tpu import io
    from pcl_tpu.registration import align
    from pcl_tpu.utils.timing import StopWatch

    src = io.load(args.source)
    tgt = io.load(args.target)
    print(f"[icp] source: {int(src.count)} pts  target: {int(tgt.count)} pts")

    sw = StopWatch()
    out, res = align(
        src, tgt,
        max_corr_dist=args.max_corr_dist,
        max_iterations=args.iters,
        transformation_eps=args.eps,
        variant=args.variant,
        reciprocal=args.reciprocal,
    )
    T = np.asarray(res.transform)
    elapsed = sw.ms()
    print(f"[icp] converged={bool(res.converged)} iters={int(res.iterations)} "
          f"fitness={float(res.fitness):.3e} corr={int(res.num_correspondences)} "
          f"({elapsed:.1f} ms)")
    np.set_printoptions(precision=6, suppress=True)
    print(T)
    if args.output:
        io.save(args.output, out)
        print(f"[icp] wrote {args.output}")
    return 0 if bool(res.converged) else 1


if __name__ == "__main__":
    sys.exit(main())
