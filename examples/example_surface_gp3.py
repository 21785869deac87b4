"""Greedy projection triangulation of a synthetic surface
(reference: examples/surface)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features
from pcl_tpu.surface.triangulation import greedy_projection_triangulation
from pcl_tpu.surface import laplacian_smooth

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(800, 2)).astype(np.float32)
z = (0.2 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])).astype(np.float32)
cloud = features.estimate_normals(
    from_numpy(np.column_stack([xy, z])), k=10)
verts, tris = greedy_projection_triangulation(cloud, search_radius=0.25, mu=2.5)
smoothed = laplacian_smooth(np.asarray(verts), np.asarray(tris), n_iterations=5)
print(f"mesh: {len(np.asarray(verts))} vertices, {len(np.asarray(tris))} triangles")
print("smoothed z-range:", float(smoothed[:, 2].min()), "..",
      float(smoothed[:, 2].max()))
