"""CLI: depth PNG -> organized cloud (reference: tools/png2pcd.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Back-project a depth PNG to a cloud")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-fx", type=float, default=525.0)
    ap.add_argument("-fy", type=float, default=525.0)
    ap.add_argument("-cx", type=float, default=-1.0, help="-1 = W/2")
    ap.add_argument("-cy", type=float, default=-1.0, help="-1 = H/2")
    ap.add_argument("-scale", type=float, default=1000.0)
    args = ap.parse_args(argv)
    import numpy as np, jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.io.png import load_depth_png
    from pcl_tpu.fusion.tsdf import Intrinsics, depth_to_vertex_map
    from pcl_tpu.core.cloud import Cloud
    d = load_depth_png(args.input, scale=args.scale)
    H, W = d.shape
    intr = Intrinsics(args.fx, args.fy,
                      args.cx if args.cx >= 0 else W / 2 - 0.5,
                      args.cy if args.cy >= 0 else H / 2 - 0.5)
    vm = depth_to_vertex_map(jnp.asarray(d), intr)
    xyz = jnp.asarray(vm).reshape(-1, 3)
    mask = jnp.asarray(d > 0).reshape(-1)
    io.save(args.output, Cloud(xyz=xyz, mask=mask, width=W, height=H))
    print(f"[png2pcd] {W}x{H} -> {int(mask.sum())} valid points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
