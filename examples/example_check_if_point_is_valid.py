"""Validity of points (NaN handling): from_numpy masks non-finite rows
(reference: examples/common/example_check_if_point_is_valid.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy

pts = np.array([[0, 0, 0], [1, np.nan, 2], [3, 4, 5]], np.float32)
cloud = from_numpy(pts)
print("valid points:", int(cloud.count), "of", cloud.capacity)
assert int(cloud.count) == 2
