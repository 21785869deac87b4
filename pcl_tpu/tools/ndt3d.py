"""CLI: NDT registration (reference: tools/ndt3d.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Align two clouds with 3D NDT")
    ap.add_argument("source"); ap.add_argument("target")
    ap.add_argument("-o", "--output")
    ap.add_argument("-r", "--resolution", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=35)
    ap.add_argument("--step", type=float, default=0.1)
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.registration import ndt
    from pcl_tpu.core.transforms import transform_cloud
    src = io.load(args.source); tgt = io.load(args.target)
    res = ndt(src, tgt, resolution=args.resolution,
              max_iterations=args.iters, step_size=args.step)
    np.set_printoptions(precision=6, suppress=True)
    print(f"[ndt3d] converged={bool(res.converged)} iters={int(res.iterations)}"
          f" score={float(res.score):.4f}")
    print(np.asarray(res.transform))
    if args.output:
        io.save(args.output, transform_cloud(res.transform, src))
    return 0


if __name__ == "__main__":
    sys.exit(main())
