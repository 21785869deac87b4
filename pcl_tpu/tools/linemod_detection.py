"""CLI: detect LINEMOD templates in an organized scene
(reference: tools/linemod_detection.cpp / match_linemod_template.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Detect LINEMOD templates")
    ap.add_argument("scene", help="organized PCD with rgb")
    ap.add_argument("templates", nargs="+", help=".npz template files or reference-format .lmt/.sqmmt files")
    ap.add_argument("-threshold", type=float, default=0.75)
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.recognition.linemod import (
        build_modality_maps, spread_quantized_map, detect_templates,
        LinemodTemplate)
    c = io.load(args.scene)
    if c.height <= 1:
        raise SystemExit("linemod_detection requires an organized cloud")
    H, W = c.height, c.width
    rgb = np.asarray(c.attrs["rgb"]).reshape(H, W, 3)
    xyz_img = np.asarray(c.xyz).reshape(H, W, 3)
    valid = np.asarray(c.mask).reshape(H, W)
    qmaps = build_modality_maps(rgb, xyz_img, valid)
    smaps = [np.asarray(spread_quantized_map(q)) for q in qmaps]
    templates = []
    for p in args.templates:
        if p.endswith((".lmt", ".sqmmt")):
            from pcl_tpu.recognition.linemod_io import load_templates
            templates.extend(load_templates(p))
        else:
            z = np.load(p)
            templates.append(LinemodTemplate(
                offsets=z["offsets"], bins=z["bins"], modality=z["modality"],
                height=int(z["height"]), width=int(z["width"])))
    dets = detect_templates(smaps, templates, threshold=args.threshold)
    for d in dets:
        print(f"[linemod_detection] template={d.template_id} "
              f"score={d.score:.3f} at (y={d.y}, x={d.x})")
    if not dets:
        print("[linemod_detection] no detections")
    return 0


if __name__ == "__main__":
    sys.exit(main())
