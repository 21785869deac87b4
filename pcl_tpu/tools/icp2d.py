"""CLI: 2D ICP in the XY plane (reference: tools/icp2d.cpp)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Planar ICP (x, y, theta)")
    ap.add_argument("source"); ap.add_argument("target"); ap.add_argument("output")
    ap.add_argument("-max_dist", type=float, default=0.5)
    ap.add_argument("-iters", type=int, default=50)
    args = ap.parse_args(argv)
    import numpy as np, jax.numpy as jnp
    import dataclasses
    from pcl_tpu import io, native
    from pcl_tpu.registration.estimation import estimate_2d
    from pcl_tpu.core.transforms import transform_points
    src = io.load(args.source)
    tgt = io.load(args.target)
    sxy = np.asarray(src.xyz)[np.asarray(src.mask)].copy()
    sxy[:, 2] = 0.0
    txy = np.asarray(tgt.xyz)[np.asarray(tgt.mask)].copy()
    txy[:, 2] = 0.0
    tree = native.KdTree(txy)
    T = np.eye(4, dtype=np.float32)
    for _ in range(args.iters):
        cur = sxy @ T[:3, :3].T + T[:3, 3]
        d2, idx = tree.knn(cur, 1)
        ok = d2[:, 0] < args.max_dist ** 2
        if ok.sum() < 3:
            break
        Td = np.asarray(estimate_2d(
            jnp.asarray(cur), jnp.asarray(txy[idx[:, 0]]),
            jnp.asarray(ok.astype(np.float32))))
        T = Td @ T
        if np.abs(Td - np.eye(4)).max() < 1e-7:
            break
    print(f"[icp2d] t=({T[0,3]:.4f},{T[1,3]:.4f}) "
          f"theta={float(np.arctan2(T[1,0], T[0,0])):.4f}")
    out = dataclasses.replace(src, xyz=transform_points(jnp.asarray(T), src.xyz))
    io.save(args.output, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
