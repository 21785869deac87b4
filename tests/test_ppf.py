"""PPF registration test — translation+rotation recovery with ICP refine."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu.core import transforms as tf
from pcl_tpu import features
from pcl_tpu.registration.ppf import ppf_register, ppf_features
from pcl_tpu.registration.icp import icp, fitness_score


def test_ppf_feature_invariance(rng):
    p1 = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    n1 = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    n1 = n1 / jnp.linalg.norm(n1, axis=1, keepdims=True)
    p2 = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    n2 = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    n2 = n2 / jnp.linalg.norm(n2, axis=1, keepdims=True)
    f = ppf_features(p1, n1, p2, n2)
    T = tf.se3_exp(jnp.asarray([0.3, -0.1, 0.2, 0.5, -0.4, 0.3], jnp.float32))
    R = T[:3, :3]; t = T[:3, 3]
    f2 = ppf_features(p1 @ R.T + t, n1 @ R.T, p2 @ R.T + t, n2 @ R.T)
    for a, b in zip(f, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ppf_register_recovers_pose(rng):
    # structured model (asymmetric)
    n3 = 300
    a = np.stack([rng.uniform(0, 1, n3), rng.uniform(0, 2, n3),
                  0.3 * rng.uniform(0, 1, n3) ** 2], 1)
    b = np.stack([rng.uniform(0, 1, n3), np.zeros(n3), rng.uniform(0, 1, n3)], 1)
    model_pts = np.concatenate([a, b]).astype(np.float32)
    T_true = np.asarray(tf.se3_exp(jnp.asarray(
        [0.3, -0.2, 0.4, 0.0, 0.0, 0.8], jnp.float32)))
    scene_pts = model_pts @ T_true[:3, :3].T + T_true[:3, 3]

    model = features.estimate_normals(make_cloud(jnp.asarray(model_pts)), k=12,
                                      viewpoint=jnp.asarray([0.0, 0, 100]))
    scene = features.estimate_normals(make_cloud(jnp.asarray(scene_pts.astype(np.float32))),
                                      k=12, viewpoint=jnp.asarray([0.0, 0, 100]))
    res = ppf_register(model, scene, key=jax.random.PRNGKey(1),
                       dist_step=0.1)
    assert bool(res.valid)
    fit0 = float(fitness_score(model, scene, jnp.eye(4)))
    fit = float(fitness_score(model, scene, res.transform))
    assert fit < 0.3 * fit0, (fit, fit0)
    ref = icp(model, scene, init_transform=res.transform,
              max_corr_dist=0.3, max_iterations=30)
    assert np.abs(np.asarray(ref.transform) - T_true).max() < 0.05
