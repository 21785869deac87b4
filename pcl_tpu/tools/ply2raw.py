"""CLI: PLY mesh -> raw triangle soup (reference: tools/ply2raw.cpp —
one 'x1 y1 z1 x2 y2 z2 x3 y3 z3' line per face)."""
import argparse, sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="Convert a PLY mesh to a raw triangle file")
    ap.add_argument("input"); ap.add_argument("output")
    args = ap.parse_args(argv)
    from pcl_tpu.io import ply
    from pcl_tpu.core.cloud import to_numpy
    cloud, faces = ply.load_mesh(args.input)
    if faces is None:
        raise SystemExit("ply2raw: input has no faces")
    xyz, _ = to_numpy(cloud)
    tris = xyz[np.asarray(faces)]            # [F,3,3]
    with open(args.output, "w") as f:
        for t in tris.reshape(len(tris), 9):
            f.write(" ".join(f"{v:g}" for v in t) + "\n")
    print(f"[ply2raw] wrote {args.output} ({len(tris)} triangles)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
