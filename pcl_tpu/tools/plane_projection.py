"""CLI: fit a plane with RANSAC and project the cloud onto it (reference:
tools/plane_projection.cpp + ProjectInliers semantics)."""
import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Project a cloud onto its dominant plane")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("-thresh", type=float, default=0.01,
                    help="RANSAC inlier threshold for the plane fit")
    ap.add_argument("-coeffs", default=None,
                    help="a,b,c,d — skip the fit and use this plane")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from pcl_tpu import io, sac
    from pcl_tpu.filters import project_inliers

    c = io.load(args.input)
    model = sac.PlaneModel()
    if args.coeffs:
        coeffs = jnp.asarray([float(v) for v in args.coeffs.split(",")], jnp.float32)
    else:
        res = sac.ransac(model, c.xyz, c.mask, args.thresh)
        coeffs = res.coefficients
        print(f"[plane_projection] plane "
              f"{np.array2string(np.asarray(coeffs), precision=6)} "
              f"({int(res.num_inliers)} inliers)")
    out = project_inliers(c, model, coeffs)
    io.save(args.output, out)
    print(f"[plane_projection] wrote {int(out.count)} projected points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
