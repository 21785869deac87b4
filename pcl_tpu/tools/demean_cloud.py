"""CLI: subtract the centroid (reference: tools/demean_cloud.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Demean a cloud")
    ap.add_argument("input"); ap.add_argument("output")
    args = ap.parse_args(argv)
    import dataclasses
    import jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.core.geometry import centroid
    c = io.load(args.input)
    mu = centroid(c.xyz, c.mask)
    out = dataclasses.replace(c, xyz=jnp.where(c.mask[:, None], c.xyz - mu, c.xyz))
    io.save(args.output, out)
    print(f"[demean_cloud] centroid {[round(float(x), 5) for x in mu]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
