"""Spin image descriptors (reference:
examples/features/example_spin_images.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features

rng = np.random.default_rng(0)
theta = rng.uniform(0, 2 * np.pi, 1000)
z = rng.uniform(-0.5, 0.5, 1000)
pts = np.column_stack([np.cos(theta), np.sin(theta), z]).astype(np.float32)
cloud = features.estimate_normals(from_numpy(pts), k=12)
si = np.asarray(features.local_misc.spin_images(cloud, radius=0.8,
                                                image_width=8, k=32))
print("spin images:", si.shape)
