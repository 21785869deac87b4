"""CLI: generate a random cloud (reference: tools/generate.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Generate a synthetic cloud")
    ap.add_argument("output")
    ap.add_argument("-n", type=int, default=10000)
    ap.add_argument("-distribution", choices=["uniform", "normal"], default="uniform")
    ap.add_argument("-min", type=float, default=0.0)
    ap.add_argument("-max", type=float, default=1.0)
    ap.add_argument("-stddev", type=float, default=1.0)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)
    import numpy as np
    from pcl_tpu import io
    from pcl_tpu.core.cloud import from_numpy
    rng = np.random.default_rng(args.seed)
    if args.distribution == "uniform":
        pts = rng.uniform(args.min, args.max, size=(args.n, 3))
    else:
        pts = rng.normal(scale=args.stddev, size=(args.n, 3))
    io.save(args.output, from_numpy(pts.astype(np.float32)))
    print(f"[generate] {args.n} {args.distribution} points -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
