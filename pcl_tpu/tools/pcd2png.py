"""CLI: organized PCD -> PNG image (reference: tools/pcd2png.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Render an organized cloud to PNG")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-field", choices=["z", "rgb", "intensity"], default="z")
    ap.add_argument("-scale", type=float, default=1000.0, help="depth mm scale")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.io.png import save_depth_png, save_rgb_png, save_png
    c = io.load(args.input)
    if c.height <= 1:
        raise SystemExit("pcd2png requires an organized cloud")
    H, W = c.height, c.width
    if args.field == "z":
        z = np.asarray(c.xyz[:, 2]).reshape(H, W)
        save_depth_png(args.output, z, scale=args.scale)
    elif args.field == "rgb":
        rgb = np.asarray(c.attrs["rgb"]).reshape(H, W, 3)
        save_rgb_png(args.output, rgb)
    else:
        i = np.asarray(c.attrs["intensity"]).reshape(H, W)
        i = (255 * (i - i.min()) / max(i.ptp(), 1e-9)).astype(np.uint8)
        save_png(args.output, i)
    print(f"[pcd2png] {W}x{H} {args.field} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
