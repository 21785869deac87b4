"""CLI: headless cloud viewer — HTML/ASCII snapshot of one or more PCDs
(reference: tools/pcd_viewer.cpp — the interactive PCLVisualizer CLI; on TPU
hosts there is no display, so this exports a self-contained interactive HTML
viewer and/or an ASCII z-buffer render to the terminal)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="View PCD files (headless)")
    ap.add_argument("inputs", nargs="+", help="cloud files (concatenated)")
    ap.add_argument("-html", help="write an interactive HTML viewer here")
    ap.add_argument("-ascii", action="store_true",
                    help="print an ASCII orthographic render")
    ap.add_argument("-axis", type=int, default=2, choices=[0, 1, 2],
                    help="ASCII projection axis")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.core.cloud import from_numpy, to_numpy
    pts, cols = [], []
    for p in args.inputs:
        c = io.load(p)
        xyz, attrs = to_numpy(c, compact=True)
        pts.append(xyz)
        cols.append(attrs.get("rgb"))
        mn, mx = xyz.min(0), xyz.max(0)
        print(f"[pcd_viewer] {p}: {len(xyz)} points, "
              f"bbox [{mn[0]:.3g},{mn[1]:.3g},{mn[2]:.3g}] .. "
              f"[{mx[0]:.3g},{mx[1]:.3g},{mx[2]:.3g}], "
              f"attrs: {sorted(attrs)}")
    merged = from_numpy(np.concatenate(pts).astype(np.float32))
    if all(cc is not None for cc in cols):
        import jax.numpy as jnp
        merged = merged.with_attrs(rgb=jnp.asarray(
            np.concatenate(cols).astype(np.float32)))
    if args.html:
        from pcl_tpu.visualization.export import cloud_to_html
        cloud_to_html(args.html, merged, title=" + ".join(args.inputs))
        print(f"[pcd_viewer] wrote {args.html}")
    if args.ascii:
        from pcl_tpu.visualization.export import render_ascii
        print(render_ascii(merged, axis=args.axis))
    return 0


if __name__ == "__main__":
    sys.exit(main())
