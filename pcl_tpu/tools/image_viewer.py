"""CLI: headless image viewer — snapshot an organized cloud's channels
(reference: tools/image_viewer.cpp — interactive ImageViewer; here: writes
the RGB and/or depth channels of an organized cloud as PNGs)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Snapshot an organized cloud as images")
    ap.add_argument("input", help="organized PCD")
    ap.add_argument("-rgb", help="write the color channel PNG here")
    ap.add_argument("-depth", help="write the depth channel (16-bit mm) PNG here")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.io.png import save_rgb_png, save_depth_png
    c = io.load(args.input)
    if c.height <= 1:
        raise SystemExit("image_viewer: input is not organized")
    H, W = c.height, c.width
    wrote = []
    if args.rgb:
        if "rgb" not in c.attrs:
            raise SystemExit("image_viewer: no rgb attr")
        save_rgb_png(args.rgb, np.asarray(c.attrs["rgb"]).reshape(H, W, 3))
        wrote.append(args.rgb)
    if args.depth:
        z = np.asarray(c.xyz[:, 2]).reshape(H, W)
        z = np.where(np.asarray(c.mask).reshape(H, W), z, 0.0)
        save_depth_png(args.depth, z)
        wrote.append(args.depth)
    print(f"[image_viewer] {W}x{H} organized cloud"
          + (f" -> {', '.join(wrote)}" if wrote else " (no outputs requested)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
