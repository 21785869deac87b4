"""CLI: inject NaNs for robustness testing (reference: tools/pcd_introduce_nan.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Randomly invalidate points with NaN")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-fraction", type=float, default=0.1)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)
    import dataclasses
    import numpy as np, jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.io import pcd as pcd_io
    c = io.load(args.input, keep_invalid=True)
    rng = np.random.default_rng(args.seed)
    kill = rng.random(c.capacity) < args.fraction
    xyz = np.asarray(c.xyz).copy()
    xyz[kill] = np.nan
    out = dataclasses.replace(c, xyz=jnp.asarray(xyz),
                              mask=c.mask & jnp.asarray(~kill))
    pcd_io.save(args.output, out, data="ascii", compact=False)
    print(f"[pcd_introduce_nan] invalidated {int(kill.sum())} of {c.capacity}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
