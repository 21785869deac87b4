"""ISM on the reference's own train/recognize fixtures.

Mirrors reference test/recognition/test_recognition_ism.cpp (ISM,
TrainRecognize): train an implicit shape model on ism_train.pcd (class 0,
sampling size 2.0, FPFH descriptors, normals from a 25-unit radius
neighborhood), run findObjects on ism_test.pcd, and require a non-empty
vote list and at least one strongest peak at radius = 10 * sigma,
sigma = model.sigmas[class] — the reference test's exact recipe.
"""

import numpy as np
import jax.numpy as jnp

from conftest import reference_pcd
from pcl_tpu.core.cloud import make_cloud, ATTR_NORMAL
from pcl_tpu.io import pcd as pcd_io
from pcl_tpu import features
from pcl_tpu.recognition import (
    train_ism,
    find_objects,
    find_strongest_peaks,
    save_ism_model,
    load_ism_model,
)


def _load(name):
    c = pcd_io.load(reference_pcd(name))
    return np.asarray(c.xyz)[np.asarray(c.mask)]


def _normals(xyz):
    """NormalEstimation with setRadiusSearch(25.0) (test file :138)."""
    c = make_cloud(jnp.asarray(xyz))
    c = features.estimate_normals(c, k=32, radius=25.0)
    return np.asarray(c.attrs[ATTR_NORMAL])


def _fpfh_feature_fn(pts, nrm):
    """FPFHEstimation on the sampled cloud (the reference wires the
    estimator's input to the sampled points only, hpp:1211)."""
    k = min(16, len(pts) - 1)
    c = make_cloud(jnp.asarray(pts),
                   attrs={ATTR_NORMAL: jnp.asarray(nrm)})
    return np.asarray(features.estimate_fpfh(c, k=k))


def test_ism_train_recognize():
    train_xyz = _load("ism_train.pcd")
    test_xyz = _load("ism_test.pcd")
    train_nrm = _normals(train_xyz)
    test_nrm = _normals(test_xyz)

    model = train_ism(
        [train_xyz], [train_nrm], [0], _fpfh_feature_fn,
        sampling_size=2.0)
    assert model.n_visual_words > 0
    assert model.sigmas[0] > 0

    # reference text-format round trip on a real model
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "trained.ism")
        save_ism_model(model, path)
        model = load_ism_model(path)

    sigma = float(model.sigmas[0])
    votes, strengths, _ = find_objects(
        model, test_xyz, test_nrm, 0, _fpfh_feature_fn, sampling_size=2.0)
    assert len(votes) > 0, "no votes cast"

    peaks = find_strongest_peaks(
        votes, strengths, 0, non_maxima_radius=sigma * 10.0, sigma=sigma)
    assert len(peaks) > 0, "no strongest peaks"
    center, density = peaks[0]
    assert density > 0
    # the detected center must lie inside the scene's bounding box
    # (the fixture is a single object)
    lo, hi = test_xyz.min(axis=0), test_xyz.max(axis=0)
    assert np.all(center >= lo - 25.0) and np.all(center <= hi + 25.0)
