"""CLI: headless registration visualizer — ICP progress as SVG frames
(reference: tools/registration_visualizer.cpp — live PCLVisualizer display of
intermediate ICP correspondences; here: runs ICP in stages and writes an SVG
top-down snapshot of source/target per stage plus an MSE-vs-iteration plot)."""
import argparse, os, sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Visualize ICP progress (headless)")
    ap.add_argument("source"); ap.add_argument("target")
    ap.add_argument("out_dir")
    ap.add_argument("-iters", type=int, default=20)
    ap.add_argument("-stages", type=int, default=5,
                    help="number of SVG snapshots across the run")
    ap.add_argument("-dist", type=float, default=float("inf"))
    args = ap.parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.registration.icp import icp
    from pcl_tpu.core.transforms import transform_points
    from pcl_tpu.visualization.plotter import plot_xy_svg
    src = io.load(args.source)
    tgt = io.load(args.target)
    os.makedirs(args.out_dir, exist_ok=True)
    per_stage = max(args.iters // args.stages, 1)
    T = jnp.eye(4)
    mses = []
    txy = np.asarray(tgt.xyz)[np.asarray(tgt.mask)]
    for s in range(args.stages):
        res = icp(src, tgt, init_transform=T, max_corr_dist=args.dist,
                  max_iterations=per_stage, transformation_eps=0.0,
                  abs_mse_eps=0.0, rel_mse_eps=0.0)
        T = res.transform
        mses.append(float(res.fitness))
        sxy = np.asarray(transform_points(T, src.xyz))[np.asarray(src.mask)]
        frame = os.path.join(args.out_dir, f"stage_{s:03d}.svg")
        plot_xy_svg(frame,
                    [(txy[:, 0], txy[:, 1], "target"),
                     (sxy[:, 0], sxy[:, 1], "source")],
                    title=f"iter {(s + 1) * per_stage}  mse={mses[-1]:.4g}")
        print(f"[registration_visualizer] {frame} mse={mses[-1]:.6g}")
    plot_xy_svg(os.path.join(args.out_dir, "mse.svg"),
                [(np.arange(1, len(mses) + 1, dtype=float) * per_stage,
                  np.asarray(mses), "mse")],
                title="ICP convergence")
    print(f"[registration_visualizer] {args.stages} stages -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
