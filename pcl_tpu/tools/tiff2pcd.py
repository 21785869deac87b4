"""CLI: depth(+RGB) TIFF frames -> organized PCDs
(reference: tools/tiff2pcd.cpp — pairs depth and RGB TIFF directories and
writes one organized cloud per frame; depth in 16-bit millimeters)."""
import argparse, glob, os, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Convert TIFF depth frames to PCDs")
    ap.add_argument("depth_dir", help="directory of 16-bit depth TIFFs (mm)")
    ap.add_argument("out_dir")
    ap.add_argument("-rgb_dir", help="optional directory of matching RGB TIFFs")
    ap.add_argument("-focal", type=float, default=525.0)
    ap.add_argument("-scale", type=float, default=1000.0,
                    help="depth units per meter")
    args = ap.parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.io.tiff import load_tiff
    from pcl_tpu.fusion.tsdf import depth_to_vertex_map, Intrinsics
    from pcl_tpu.core.cloud import make_cloud
    depth_paths = sorted(glob.glob(os.path.join(args.depth_dir, "*.tif"))
                         + glob.glob(os.path.join(args.depth_dir, "*.tiff")))
    rgb_paths = []
    if args.rgb_dir:
        rgb_paths = sorted(glob.glob(os.path.join(args.rgb_dir, "*.tif"))
                           + glob.glob(os.path.join(args.rgb_dir, "*.tiff")))
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for i, dp in enumerate(depth_paths):
        depth = load_tiff(dp).astype(np.float32) / args.scale
        H, W = depth.shape
        intr = Intrinsics(args.focal, args.focal, W / 2.0, H / 2.0)
        vm = depth_to_vertex_map(jnp.asarray(depth), intr)
        mask = jnp.asarray((depth > 0).reshape(-1))
        c = make_cloud(vm.reshape(-1, 3), mask, width=W, height=H)
        if i < len(rgb_paths):
            rgb = load_tiff(rgb_paths[i]).astype(np.float32) / 255.0
            c = c.with_attrs(rgb=jnp.asarray(rgb.reshape(-1, 3)))
        out = os.path.join(args.out_dir, f"frame_{i:06d}.pcd")
        io.save(out, c)
        print(f"[tiff2pcd] {dp} -> {out} ({int(c.count)} points)")
        n += 1
    print(f"[tiff2pcd] {n} frames converted")
    return 0 if n else 1


if __name__ == "__main__":
    sys.exit(main())
