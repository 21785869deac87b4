"""CLI: add Gaussian noise (reference: tools/add_gaussian_noise.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Add Gaussian noise to a cloud")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("-sd", type=float, default=0.01)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)
    import jax, jax.numpy as jnp
    from pcl_tpu import io
    c = io.load(args.input)
    noise = jax.random.normal(jax.random.PRNGKey(args.seed), c.xyz.shape) * args.sd
    out = c.with_xyz(jnp.where(c.mask[:, None], c.xyz + noise, 0.0))
    print(f"[add_gaussian_noise] sd={args.sd} on {int(c.count)} points")
    io.save(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
