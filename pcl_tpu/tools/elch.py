"""CLI: ELCH explicit loop closing over a scan chain (reference:
tools/elch.cpp — detect the loop, ICP the loop ends, distribute the
correction over the chain)."""
import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Close the loop of a scan chain and distribute the correction")
    ap.add_argument("inputs", nargs="+", help="scans in chain order (loop: last ~ first)")
    ap.add_argument("-dist", type=float, default=0.1, help="ICP max correspondence distance")
    ap.add_argument("-iter", type=int, default=50)
    ap.add_argument("-suffix", default="_out")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.core.transforms import transform_points
    from pcl_tpu.registration.icp import icp
    from pcl_tpu.registration.graph import elch_distribute

    clouds = [io.load(p) for p in args.inputs]
    V = len(clouds)
    if V < 3:
        print("[elch] need at least 3 scans", file=sys.stderr)
        return 1

    # align loop end (last scan) onto loop start (first scan)
    res = icp(clouds[-1], clouds[0], max_corr_dist=args.dist,
              max_iterations=args.iter)
    print(f"[elch] loop ICP converged={bool(res.converged)} "
          f"fitness={float(res.fitness):.4g}")

    poses0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (V, 1, 1))
    poses = elch_distribute(poses0, res.transform)

    for i, (path, c) in enumerate(zip(args.inputs, clouds)):
        out = c.with_xyz(transform_points(poses[i], c.xyz))
        base, ext = os.path.splitext(path)
        io.save(base + args.suffix + (ext or ".pcd"), out)
    print(f"[elch] wrote {V} corrected scans")
    return 0


if __name__ == "__main__":
    sys.exit(main())
