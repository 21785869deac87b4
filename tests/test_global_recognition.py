"""3d_rec_framework-style global recognition pipeline
(recognition/global_pipeline.py): train per-view global descriptors of
model objects, then classify + pose scene clusters end-to-end (plane
removal -> clustering -> descriptor NN -> ICP refine)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.core.cloud import Cloud, from_numpy
from pcl_tpu.recognition import (GlobalModelDatabase, train_global_database,
                                 recognize_clusters, segment_scene_clusters,
                                 render_views)


def _box(ext, n=3000, seed=0):
    """Surface-sampled axis box with distinct extents (classifiable)."""
    rng = np.random.default_rng(seed)
    face = rng.integers(0, 6, n)
    u = rng.uniform(-0.5, 0.5, (n, 2))
    pts = np.zeros((n, 3), np.float32)
    for f in range(6):
        sel = face == f
        ax = f // 2
        sgn = 1.0 if f % 2 else -1.0
        oth = [a for a in range(3) if a != ax]
        pts[sel, ax] = sgn * 0.5
        pts[sel, oth[0]] = u[sel, 0]
        pts[sel, oth[1]] = u[sel, 1]
    return (pts * np.asarray(ext, np.float32)).astype(np.float32)


def _sphere(r=0.1, n=3000, seed=1):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (r * v).astype(np.float32)


@pytest.fixture(scope="module")
def db():
    models = {"tallbox": _box([0.06, 0.06, 0.25]),
              "ball": _sphere(0.08)}
    return train_global_database(models, descriptor="esf", n_views=6)


class TestTraining:
    def test_views_and_descs(self, db):
        assert db.descs.shape[0] == 12              # 2 models x 6 views
        assert set(db.labels) == {"tallbox", "ball"}
        for v in db.views:
            assert len(v) > 200                     # partial but substantial

    def test_save_load_roundtrip(self, db, tmp_path):
        db.save(str(tmp_path / "db"))
        back = GlobalModelDatabase.load(str(tmp_path / "db"))
        assert back.labels == db.labels
        np.testing.assert_allclose(back.descs, db.descs)


class TestRecognition:
    def test_classifies_clusters(self, db):
        # scene clusters = transformed partial views of each model
        rng = np.random.default_rng(3)
        views_t = render_views(_box([0.06, 0.06, 0.25]), n_views=3, seed=9)
        views_s = render_views(_sphere(0.08), n_views=3, seed=9)
        clusters = [views_t[1]["xyz"] + np.float32([0.5, 0.2, 0.1]),
                    views_s[2]["xyz"] + np.float32([-0.3, 0.1, 0.0])]
        recs = recognize_clusters(db, clusters, n_candidates=3,
                                  refine_iterations=25)
        assert recs[0] is not None and recs[0].label == "tallbox", recs[0]
        assert recs[1] is not None and recs[1].label == "ball", recs[1]
        # refined pose actually registers the matched view onto the cluster
        for rec, cl in zip(recs, clusters):
            view = db.views[rec.view_index]
            T = rec.transform
            moved = view @ T[:3, :3].T + T[:3, 3]
            from scipy.spatial import cKDTree
            d, _ = cKDTree(cl).query(moved, k=1)
            assert np.median(d) < 0.02, np.median(d)


class TestSceneSegmentation:
    def test_plane_removal_and_clustering(self):
        rng = np.random.default_rng(5)
        # table plane + two objects on it
        table = np.c_[rng.uniform(-1, 1, (4000, 2)),
                      np.zeros(4000)].astype(np.float32)
        obj1 = _box([0.1, 0.1, 0.2], n=1500) + np.float32([0.4, 0.3, 0.15])
        obj2 = _sphere(0.09, n=1500) + np.float32([-0.4, -0.2, 0.12])
        scene = from_numpy(np.concatenate([table, obj1, obj2]))
        clusters = segment_scene_clusters(scene, plane_threshold=0.02,
                                          cluster_tolerance=0.08,
                                          min_cluster_size=100)
        assert len(clusters) == 2
        sizes = sorted(len(c) for c in clusters)
        assert sizes[0] > 800
