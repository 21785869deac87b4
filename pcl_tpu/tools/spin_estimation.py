"""CLI: spin-image descriptors (reference: tools/spin_estimation.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Per-point spin images")
    ap.add_argument("input"); ap.add_argument("output", help=".npy [N,bins] out")
    ap.add_argument("-radius", type=float, default=0.05)
    ap.add_argument("-k", type=int, default=16, help="normal neighborhood")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.features.normals import estimate_normals
    from pcl_tpu.features.local_misc import spin_images
    c = io.load(args.input)
    c = estimate_normals(c, k=args.k)
    si = np.asarray(spin_images(c, radius=args.radius))
    np.save(args.output, si)
    print(f"[spin_estimation] {int(c.count)} pts -> spin images {si.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
