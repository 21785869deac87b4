"""Align a rigidly displaced cloud with ICP and print the recovered pose
(reference: examples/ + tutorial iterative_closest_point)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.registration.icp import align

rng = np.random.default_rng(0)
pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
offset = np.float32([0.08, -0.04, 0.02])
src = from_numpy(pts)
tgt = from_numpy(pts + offset)

aligned, res = align(src, tgt, max_corr_dist=0.5, max_iterations=30)
print("converged:", bool(res.converged), "iters:", int(res.iterations))
print("recovered translation:", np.asarray(res.transform[:3, 3]),
      "(true:", offset, ")")
