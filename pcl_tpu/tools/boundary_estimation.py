"""CLI: boundary point detection (reference: tools/boundary_estimation.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Mark boundary points (angle criterion)")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-radius", type=float, default=0.03)
    ap.add_argument("-angle", type=float, default=1.5708, help="max gap angle (rad)")
    args = ap.parse_args(argv)
    import dataclasses
    import numpy as np, jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.core.cloud import compact
    from pcl_tpu.features.normals import estimate_normals
    from pcl_tpu.features.local_misc import boundary_estimation
    c = io.load(args.input)
    c = estimate_normals(c, k=16)
    b = boundary_estimation(c, radius=args.radius, angle_threshold=args.angle)
    out = compact(dataclasses.replace(c, mask=c.mask & b))
    io.save(args.output, out)
    print(f"[boundary_estimation] {int(c.count)} pts -> {int(out.count)} boundary")
    return 0


if __name__ == "__main__":
    sys.exit(main())
