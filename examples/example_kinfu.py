"""KinectFusion on a synthetic depth sequence: track + integrate + raycast
(reference: gpu/kinfu usage in apps; here the fusion module). The scene is
a plane with a bump (a plane alone leaves point-to-plane ICP unconstrained)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.fusion.kinfu import kinfu_init, kinfu_step
from pcl_tpu.fusion.tsdf import Intrinsics, make_volume

H, W = 48, 64
intr = Intrinsics(fx=48.0, fy=48.0, cx=W / 2.0, cy=H / 2.0)
vol = make_volume(resolution=64, size=2.0, origin=jnp.asarray([-1.0, -1.0, 0.25]))
state = kinfu_init(vol, H, W)
v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
bump = 0.25 * np.exp(-((u - W / 2) ** 2 + (v - H / 2) ** 2) / 80.0)
depth = (1.0 - bump).astype(np.float32)
for f in range(4):
    state = kinfu_step(state, jnp.asarray(depth), intr)
    t = np.asarray(state.pose[:3, 3])
    print(f"frame {f}: lost={bool(state.lost)} t={np.round(t, 4)}")
