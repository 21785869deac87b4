"""CLI: cloud-to-cloud error (reference: tools/compute_cloud_error.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Nearest-neighbor error statistics")
    ap.add_argument("source"); ap.add_argument("target")
    ap.add_argument("-correspondence", default="nn", choices=["nn", "index"])
    args = ap.parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.search import bruteforce
    a = io.load(args.source); b = io.load(args.target)
    if args.correspondence == "nn":
        _i, d2 = bruteforce.nn1(b.xyz, b.mask, a.xyz)
        d2 = np.asarray(jnp.where(a.mask, d2, np.nan))
    else:
        d2 = np.asarray(jnp.sum((a.xyz - b.xyz) ** 2, axis=-1))
        d2[~np.asarray(a.mask)] = np.nan
    d = np.sqrt(d2[np.isfinite(d2)])
    print(f"[compute_cloud_error] n={len(d)} rmse={np.sqrt((d**2).mean()):.6f} "
          f"mean={d.mean():.6f} median={np.median(d):.6f} max={d.max():.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
