"""CLI: crop a cloud to a hull polytope (reference: tools/crop_to_hull.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Keep points inside the convex hull of a second cloud")
    ap.add_argument("input"); ap.add_argument("hull_cloud"); ap.add_argument("output")
    ap.add_argument("--outside", action="store_true", help="keep outside instead")
    args = ap.parse_args(argv)
    import numpy as np, jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.core.cloud import compact
    from pcl_tpu.surface.hulls import convex_hull
    from pcl_tpu.filters.crop_hull import crop_hull
    c = io.load(args.input)
    hc = io.load(args.hull_cloud)
    verts, faces = convex_hull(hc, dim=3)
    out = compact(crop_hull(c, jnp.asarray(verts), jnp.asarray(faces),
                            negative=args.outside))
    io.save(args.output, out)
    print(f"[crop_to_hull] {int(c.count)} -> {int(out.count)} points "
          f"(hull {len(faces)} facets)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
