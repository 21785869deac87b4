"""Organized clouds keep width/height and row-major pixel order
(reference: examples/common/example_organized_point_cloud.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy

H, W = 4, 6
u, v = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
grid = np.stack([u, v, np.ones((H, W))], axis=-1).reshape(-1, 3).astype(np.float32)
cloud = from_numpy(grid, width=W, height=H)
print("organized:", cloud.is_organized, "width:", cloud.width, "height:", cloud.height)
assert cloud.is_organized and cloud.width == W
