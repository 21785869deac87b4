"""CLI: minimal ICP alignment of two clouds
(reference: tools/iterative_closest_point.cpp — the tutorial-style variant of
tools/icp.cpp: load source+target, align, print transform + fitness)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Align source onto target with ICP")
    ap.add_argument("source"); ap.add_argument("target")
    ap.add_argument("output", nargs="?", help="write aligned source here")
    ap.add_argument("-iters", type=int, default=50)
    ap.add_argument("-dist", type=float, default=float("inf"),
                    help="max correspondence distance")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.registration.icp import align
    src = io.load(args.source)
    tgt = io.load(args.target)
    aligned, res = align(src, tgt, max_corr_dist=args.dist,
                         max_iterations=args.iters)
    np.set_printoptions(precision=6, suppress=True)
    print(f"[iterative_closest_point] converged={bool(res.converged)} "
          f"score={float(res.fitness):.6g} iters={int(res.iterations)}")
    print(np.asarray(res.transform))
    if args.output:
        io.save(args.output, aligned)
    return 0


if __name__ == "__main__":
    sys.exit(main())
