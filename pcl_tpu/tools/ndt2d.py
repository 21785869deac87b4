"""CLI: 2-D NDT scan matching (reference: tools/ndt2d.cpp)."""
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Planar NDT alignment of two scans")
    ap.add_argument("source")
    ap.add_argument("target")
    ap.add_argument("output", nargs="?", default=None)
    ap.add_argument("-grid", type=float, default=1.0, help="NDT cell size")
    ap.add_argument("-iters", type=int, default=50)
    args = ap.parse_args(argv)

    from pcl_tpu import io
    from pcl_tpu.core.transforms import transform_points
    from pcl_tpu.registration import ndt_2d

    src = io.load(args.source)
    tgt = io.load(args.target)
    res = ndt_2d(src, tgt, grid_extent=args.grid, max_iterations=args.iters)
    tx, ty, th = np.asarray(res.params)
    print(f"[ndt2d] converged={bool(res.converged)} iters={int(res.iterations)} "
          f"score={float(res.score):.4g}")
    print(f"[ndt2d] tx={tx:.6f} ty={ty:.6f} theta={th:.6f}")
    print(np.array2string(np.asarray(res.transform), precision=6, suppress_small=True))
    if args.output:
        out = src.with_xyz(transform_points(res.transform, src.xyz))
        io.save(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
