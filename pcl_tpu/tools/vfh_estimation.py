"""CLI: VFH global descriptor (reference: tools/vfh_estimation.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Estimate the 308-bin VFH signature")
    ap.add_argument("input"); ap.add_argument("output", help=".npy descriptor out")
    ap.add_argument("-k", type=int, default=16, help="normal neighborhood")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.features.normals import estimate_normals
    from pcl_tpu.features.global_desc import estimate_vfh
    c = io.load(args.input)
    c = estimate_normals(c, k=args.k)
    vfh = np.asarray(estimate_vfh(c))
    np.save(args.output, vfh)
    print(f"[vfh_estimation] {int(c.count)} pts -> VFH[{vfh.shape[-1]}] "
          f"(sum {float(vfh.sum()):.4f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
