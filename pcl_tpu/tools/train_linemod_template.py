"""CLI: extract a LINEMOD template from an organized scene region
(reference: tools/train_linemod_template.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train a LINEMOD template")
    ap.add_argument("input", help="organized PCD with rgb")
    ap.add_argument("output", help=".npz template, or .lmt/.sqmmt for the reference pcl::LINEMOD byte format")
    ap.add_argument("-region", type=int, nargs=4, metavar=("y0", "x0", "h", "w"),
                    default=None, help="defaults to the valid bounding box")
    ap.add_argument("-n_features", type=int, default=63)
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.recognition.linemod import build_modality_maps, extract_template
    c = io.load(args.input)
    if c.height <= 1:
        raise SystemExit("train_linemod_template requires an organized cloud")
    H, W = c.height, c.width
    rgb = np.asarray(c.attrs["rgb"]).reshape(H, W, 3)
    xyz_img = np.asarray(c.xyz).reshape(H, W, 3)
    valid = np.asarray(c.mask).reshape(H, W)
    qmaps = build_modality_maps(rgb, xyz_img, valid)
    if args.region is None:
        mask = np.asarray(c.mask).reshape(c.height, c.width)
        ys, xs = np.nonzero(mask)
        region = (int(ys.min()), int(xs.min()),
                  int(ys.max() - ys.min() + 1), int(xs.max() - xs.min() + 1))
    else:
        region = tuple(args.region)
    t = extract_template([np.asarray(q) for q in qmaps], region,
                         n_features=args.n_features)
    if args.output.endswith((".lmt", ".sqmmt")):
        from pcl_tpu.recognition.linemod_io import save_templates
        save_templates(args.output, [t])
    else:
        np.savez(args.output, offsets=t.offsets, bins=t.bins,
                 modality=t.modality, height=t.height, width=t.width)
    print(f"[train_linemod_template] region {region} -> "
          f"{len(t.offsets)} features")
    return 0


if __name__ == "__main__":
    sys.exit(main())
