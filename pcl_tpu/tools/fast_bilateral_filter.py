"""CLI: fast bilateral smoothing of organized depth
(reference: tools/fast_bilateral_filter.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Edge-preserving depth smoothing")
    ap.add_argument("input", help="organized PCD"); ap.add_argument("output")
    ap.add_argument("-sigma_s", type=float, default=8.0)
    ap.add_argument("-sigma_r", type=float, default=0.05)
    args = ap.parse_args(argv)
    import dataclasses
    import numpy as np, jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.filters.convolution import fast_bilateral
    from pcl_tpu.filters.extras import bilateral_filter
    c = io.load(args.input)
    if c.height > 1:
        # organized: filter the z channel in image space (the reference path)
        z = c.xyz[:, 2].reshape(c.height, c.width)
        zs = fast_bilateral(z, sigma_s=args.sigma_s, sigma_r=args.sigma_r)
        scale = (zs / jnp.where(z != 0, z, 1.0)).reshape(-1)
        xyz = c.xyz * scale[:, None]
        out = dataclasses.replace(c, xyz=xyz)
    else:
        print("[fast_bilateral_filter] unorganized input -> point bilateral",
              file=sys.stderr)
        out = bilateral_filter(c, sigma_s=args.sigma_s, sigma_r=args.sigma_r)
    io.save(args.output, out)
    print(f"[fast_bilateral_filter] {int(c.count)} pts "
          f"(sigma_s {args.sigma_s}, sigma_r {args.sigma_r})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
