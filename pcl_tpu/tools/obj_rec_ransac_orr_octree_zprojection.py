"""CLI: z-projection of the ORR octree occupancy
(reference: tools/obj_rec_ransac_orr_octree_zprojection.cpp — builds the
octree's z-projection structure and visualizes it; here: occupancy image +
z-extent stats, written as a PGM)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Octree occupancy z-projection")
    ap.add_argument("input")
    ap.add_argument("output", help="PGM image of the z-projected occupancy")
    ap.add_argument("-leaf", type=float, default=0.05)
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    c = io.load(args.input)
    xyz = np.asarray(c.xyz)[np.asarray(c.mask)]
    mn = xyz.min(0)
    cells = np.floor((xyz - mn) / args.leaf).astype(np.int64)
    nx, ny = int(cells[:, 0].max()) + 1, int(cells[:, 1].max()) + 1
    # per-(x,y) pillar: number of occupied z-levels (the z-projection's
    # full-pillar height)
    lin = (cells[:, 0] * ny + cells[:, 1]) * (int(cells[:, 2].max()) + 2) \
        + cells[:, 2]
    uniq = np.unique(lin)
    zmax = int(cells[:, 2].max()) + 2
    pillar = np.bincount(uniq // zmax, minlength=nx * ny).reshape(nx, ny)
    img = (pillar.astype(np.float32) / max(pillar.max(), 1) * 255).astype(np.uint8)
    with open(args.output, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())
    print(f"[obj_rec_ransac_orr_octree_zprojection] {nx}x{ny} pillars, "
          f"max height {int(pillar.max())} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
