"""CLI: dense-CRF refinement of a labeled cloud
(reference: tools/crf_segmentation.cpp — cloud + per-point initial labels in,
mean-field-refined labels out)."""
import argparse, sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Refine per-point labels with a fully-connected CRF")
    ap.add_argument("input", help="PCD with a 'label' attr (optionally 'rgb')")
    ap.add_argument("output")
    ap.add_argument("-iters", type=int, default=10)
    ap.add_argument("-sxyz", type=float, default=0.05,
                    help="Gaussian smoothness stddev (meters)")
    ap.add_argument("-srgb", type=float, default=0.1,
                    help="bilateral color stddev (0..1 units)")
    ap.add_argument("-unary-confidence", type=float, default=0.8)
    args = ap.parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    from pcl_tpu import io
    from pcl_tpu.core.cloud import to_numpy
    from pcl_tpu.ml.densecrf import DenseCRF
    c = io.load(args.input)
    xyz, attrs = to_numpy(c)
    if "label" not in attrs:
        raise SystemExit("crf_segmentation: input needs a 'label' attr")
    labels = attrs["label"].astype(np.int32).reshape(-1)
    n = len(xyz)
    n_classes = int(labels.max()) + 1
    # unary energy from the initial labeling (reference: setUnaryEnergyFromAnnotations)
    p = (1.0 - args.unary_confidence) / max(n_classes - 1, 1)
    unary = np.full((n, n_classes), -np.log(p), np.float32)
    unary[np.arange(n), labels] = -np.log(args.unary_confidence)
    crf = DenseCRF(n, n_classes)
    crf.set_unary_energy(unary)
    crf.add_pairwise_gaussian(xyz, args.sxyz)
    if "rgb" in attrs:
        crf.add_pairwise_bilateral(xyz, attrs["rgb"], args.sxyz * 4, args.srgb)
    q = crf.inference(args.iters)
    new_labels = np.argmax(np.asarray(q), axis=1).astype(np.int32)
    changed = int((new_labels != labels).sum())
    out = c.with_attrs(label=jnp.zeros((c.capacity,), jnp.int32)
                       .at[: len(new_labels)].set(jnp.asarray(new_labels)))
    io.save(args.output, out)
    print(f"[crf_segmentation] {n} points, {n_classes} classes, "
          f"{changed} labels changed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
