"""Correspondence-grouping recognition golden on the milk fixtures.

Mirrors reference test/recognition/test_recognition_cg.cpp end to end:
find the milk-carton model (milk.pcd) inside the cluttered scene
(milk_cartoon_all_small_clorox.pcd) via SHOT correspondences.

Reference recipe (test file :185-236): normals k=10; uniform sampling
model r=0.005 / scene r=0.02; SHOT352 r=0.015 computed at the keypoints
with the FULL cloud as search surface; scene->model descriptor NN kept at
squared distance < 0.25. Then:

- GeometricConsistencyGrouping (gc_size 0.001, threshold >25):
  EXPECT exactly 1 instance with model->scene RMS < 1e-4 (:155-159);
- Hough3DGrouping (BOARD RFs r=0.015, bin 0.03, threshold 10):
  EXPECT >=1 instance with min RMS < 1e-2 (:104-141).

The model cloud is an exact subset of the scene (the milk carton cropped
at identity), so the expected transform is the identity and RMS ~ 0 for a
correct pipeline. The whole pipeline runs batched: one [S,M] descriptor
matmul for matching, the [C,C] consistency matrix for GC, trilinear
hashed Hough splats, and per-instance RANSAC refinement.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from conftest import reference_pcd
from pcl_tpu.io import pcd as pcd_io
from pcl_tpu.core.cloud import make_cloud
from pcl_tpu import features
from pcl_tpu.features.lrf import board_lrf
from pcl_tpu.filters import uniform_sample
from pcl_tpu.recognition import (
    geometric_consistency_grouping,
    hough3d_grouping,
    refine_grouping_sac,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pipeline():
    model = pcd_io.load(reference_pcd("milk.pcd"))
    scene = pcd_io.load(reference_pcd("milk_cartoon_all_small_clorox.pcd"))
    mx = np.asarray(model.xyz)[np.asarray(model.mask)]
    mc = features.estimate_normals(make_cloud(jnp.asarray(mx)), k=10)
    # scene stays ORGANIZED: exact window-kNN normals at 241k valid points
    sc = features.estimate_normals(scene, k=10)
    sx = np.asarray(sc.xyz)[np.asarray(sc.mask)]

    mk = uniform_sample(mc, 0.005)
    sk = uniform_sample(sc, 0.02)
    mkx = np.asarray(mk.xyz)[np.asarray(mk.mask)]
    skx = np.asarray(sk.xyz)[np.asarray(sk.mask)]

    dm = np.asarray(features.estimate_shot(
        make_cloud(jnp.asarray(mkx)), 0.015, k=256, surface=mc))
    ds = np.asarray(features.estimate_shot(
        make_cloud(jnp.asarray(skx)), 0.015, k=256, surface=sc))

    # scene->model NN matching, squared descriptor distance < 0.25
    d2 = ((ds * ds).sum(1)[:, None] - 2.0 * ds @ dm.T
          + (dm * dm).sum(1)[None])
    nn = d2.argmin(1)
    nnd = d2[np.arange(len(ds)), nn]
    keep = np.isfinite(nnd) & (nnd < 0.25) & (ds.sum(1) > 0)
    corr_m = nn[keep]
    corr_s = np.flatnonzero(keep)
    return dict(mx=mx, sx=sx, mc=mc, sc=sc, mkx=mkx, skx=skx,
                corr_m=corr_m, corr_s=corr_s)


def _rms(mx, sx_tree, T):
    tm = mx @ T[:3, :3].T + T[:3, 3]
    d, _ = sx_tree.query(tm)
    return float(np.sqrt((d ** 2).mean()))


def test_geometric_consistency_grouping_milk(pipeline):
    p = pipeline
    mp = p["mkx"][p["corr_m"]]
    sp = p["skx"][p["corr_s"]]
    assert len(mp) > 100, "too few SHOT correspondences"
    res = geometric_consistency_grouping(
        jnp.asarray(mp), jnp.asarray(sp), jnp.ones(len(mp), bool),
        gc_size=0.001, min_cluster_size=26, max_instances=4)
    ok = np.asarray(res.instances)
    assert ok.sum() == 1, f"expected exactly 1 instance, got {ok.sum()}"
    res = refine_grouping_sac(mp, sp, res, inlier_threshold=0.001)
    T = np.asarray(res.transforms[np.flatnonzero(ok)[0]])
    rms = _rms(p["mx"], cKDTree(p["sx"]), T)
    assert rms < 1e-4, f"GC RMS {rms}"


def test_hough3d_grouping_milk(pipeline):
    p = pipeline
    mp = p["mkx"][p["corr_m"]]
    sp = p["skx"][p["corr_s"]]
    mrf, _ = board_lrf(make_cloud(jnp.asarray(p["mkx"])), 0.015, k=128,
                       surface=p["mc"])
    srf, _ = board_lrf(make_cloud(jnp.asarray(p["skx"])), 0.015, k=128,
                       surface=p["sc"])
    res = hough3d_grouping(
        jnp.asarray(mp), jnp.asarray(sp), jnp.ones(len(mp), bool),
        jnp.asarray(p["mx"].mean(0)), bin_size=0.03, threshold=10.0,
        max_instances=4,
        model_rf=jnp.asarray(np.asarray(mrf)[p["corr_m"]]),
        scene_rf=jnp.asarray(np.asarray(srf)[p["corr_s"]]))
    ok = np.asarray(res.instances)
    assert ok.sum() >= 1, "no Hough instances"
    res = refine_grouping_sac(mp, sp, res, inlier_threshold=0.03)
    tree = cKDTree(p["sx"])
    best = min(_rms(p["mx"], tree, np.asarray(res.transforms[i]))
               for i in np.flatnonzero(ok))
    assert best < 1e-2, f"Hough min RMS {best}"
