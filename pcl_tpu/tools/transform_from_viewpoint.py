"""CLI: re-express a cloud in its VIEWPOINT frame (reference:
tools/transform_from_viewpoint.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Apply the stored viewpoint")
    ap.add_argument("input"); ap.add_argument("output")
    ap.add_argument("--inverse", action="store_true")
    args = ap.parse_args(argv)
    import numpy as np, jax.numpy as jnp
    import dataclasses
    from pcl_tpu.io import pcd as pcd_io
    from pcl_tpu.io.pcd import read_pcd_arrays
    from pcl_tpu.core.transforms import quat_to_matrix, transform_points
    header, _cols = read_pcd_arrays(args.input)
    c = pcd_io.load(args.input)
    t = np.asarray(header.viewpoint[:3], np.float32)
    qw, qx, qy, qz = header.viewpoint[3:]
    R = np.asarray(quat_to_matrix(jnp.asarray([qw, qx, qy, qz], jnp.float32)))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R; T[:3, 3] = t
    if args.inverse:
        T = np.linalg.inv(T)
    out = dataclasses.replace(c, xyz=transform_points(jnp.asarray(T), c.xyz))
    pcd_io.save(args.output, out)
    print(f"[transform_from_viewpoint] t={t.tolist()} inverse={args.inverse}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
