"""CLI: normal estimation (reference: tools/normal_estimation.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Estimate surface normals")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-k", type=int, default=16)
    ap.add_argument("-vx", type=float, default=0.0)
    ap.add_argument("-vy", type=float, default=0.0)
    ap.add_argument("-vz", type=float, default=0.0)
    args = ap.parse_args(argv)
    import jax.numpy as jnp
    from pcl_tpu import io, features
    c = io.load(args.input)
    out = features.estimate_normals(c, k=args.k,
                                    viewpoint=jnp.asarray([args.vx, args.vy, args.vz]))
    print(f"[normal_estimation] {int(out.count)} points, k={args.k}")
    io.save(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
