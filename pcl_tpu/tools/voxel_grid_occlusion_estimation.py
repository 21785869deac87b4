"""CLI: voxel occlusion estimation from the cloud viewpoint (reference:
tools/voxel_grid_occlusion_estimation.cpp — mark voxels whose line of sight
to the sensor is blocked by occupied voxels)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Estimate occluded voxels")
    ap.add_argument("input"); ap.add_argument("output",
                    help="PCD of FREE (visible) occupied-voxel centers")
    ap.add_argument("-leaf", type=float, default=0.05)
    ap.add_argument("-viewpoint", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    ap.add_argument("--occluded", action="store_true",
                    help="write occluded voxel centers instead")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.core.cloud import from_numpy
    c = io.load(args.input)
    xyz = np.asarray(c.xyz)[np.asarray(c.mask)]
    vp = np.asarray(args.viewpoint, np.float32)
    leaf = float(args.leaf)
    lo = xyz.min(0) - leaf
    occ = set(map(tuple, np.floor((xyz - lo) / leaf).astype(np.int64)))
    centers = {v: lo + (np.asarray(v) + 0.5) * leaf for v in occ}
    # DDA-free check: sample the segment voxel-center -> viewpoint at
    # half-leaf steps; occluded if any OTHER occupied voxel intersects
    visible, occluded = [], []
    for v, ctr in centers.items():
        d = vp - ctr
        L = np.linalg.norm(d)
        n = max(int(L / (leaf * 0.5)), 1)
        blocked = False
        for s in range(1, n):
            p = ctr + d * (s / n)
            key = tuple(np.floor((p - lo) / leaf).astype(np.int64))
            if key != v and key in occ:
                blocked = True
                break
        (occluded if blocked else visible).append(ctr)
    sel = occluded if args.occluded else visible
    out = np.asarray(sel, np.float32) if sel else np.zeros((0, 3), np.float32)
    io.save(args.output, from_numpy(out))
    print(f"[voxel_occlusion] {len(occ)} occupied: {len(visible)} visible, "
          f"{len(occluded)} occluded")
    return 0


if __name__ == "__main__":
    sys.exit(main())
