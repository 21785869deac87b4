"""CLI: ObjRecRANSAC model hash-table occupancy statistics
(reference: tools/obj_rec_ransac_hash_table.cpp — visualizes the model
library's pair-feature hash table; here: prints cell-occupancy stats and
optionally saves the 3D angle histogram)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Model pair-feature hash table stats")
    ap.add_argument("model")
    ap.add_argument("-pair_width", type=float, default=0.15)
    ap.add_argument("-pairs", type=int, default=2048)
    ap.add_argument("-bins", type=int, default=16)
    ap.add_argument("-output", help="write the histogram as .npy here")
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io, features
    from pcl_tpu.recognition.orr import pair_feature_hash_table
    c = io.load(args.model)
    if "normal" not in c.attrs:
        c = features.estimate_normals(c, k=16)
    hist, n_valid = pair_feature_hash_table(
        c, args.pair_width, n_pairs=args.pairs, n_bins=args.bins)
    occ = int((hist > 0).sum())
    total = args.bins ** 3
    print(f"[obj_rec_ransac_hash_table] {n_valid} pairs -> "
          f"{occ}/{total} cells occupied "
          f"(max cell {int(hist.max())}, mean occupied "
          f"{hist[hist > 0].mean() if occ else 0:.2f})")
    if args.output:
        np.save(args.output, hist)
    return 0


if __name__ == "__main__":
    sys.exit(main())
