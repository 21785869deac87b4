"""Block-matching stereo -> disparity -> cloud (reference:
examples/stereo/example_stereo_baseline.cpp)."""
import numpy as np
from pcl_tpu.stereo import block_matching, disparity_to_cloud

rng = np.random.default_rng(0)
H, W, D = 48, 64, 8
texture = rng.uniform(0, 1, size=(H, W + D)).astype(np.float32)
left = texture[:, D:]
right = texture[:, :-D] if D else texture     # uniform disparity D
disp = np.asarray(block_matching(left, right, max_disparity=16,
                                 window_radius=2))
valid = disp > 0
print("median disparity:", float(np.median(disp[valid])), "(expect ~%d)" % D)
cloud = disparity_to_cloud(disp, focal=100.0, baseline=0.1)
print("stereo cloud points:", int(cloud.count))
