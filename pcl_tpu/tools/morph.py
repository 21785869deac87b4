"""CLI: morphological filter on LiDAR ground grids (reference: tools/morph.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Morphological dilate/erode/open/close")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-operator", choices=["dilate", "erode", "open", "close"],
                    default="open")
    ap.add_argument("-resolution", type=float, default=1.0)
    args = ap.parse_args(argv)
    import dataclasses
    import jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.filters.morphological import morphological_filter
    c = io.load(args.input)
    z = morphological_filter(c, resolution=args.resolution, operator=args.operator)
    out = dataclasses.replace(c, xyz=c.xyz.at[:, 2].set(z))
    io.save(args.output, out)
    print(f"[morph] {args.operator} at resolution {args.resolution}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
