"""Organized edge detection vs the reference's synthetic-squares test.

Mirrors reference test/features/test_organized_edge_detection.cpp
(OccludedAndOccludingEdges): a 50x50 square floating 2 cm in front of a
100x100 background square must yield OCCLUDING labels exactly on the
inner square's outer perimeter and OCCLUDED labels exactly on the outer
square's inner perimeter — the PR-4275 regression class this test was
written to catch. Plus a NaN-hole fixture driving the across-NaN
correspondence march and the NAN_BOUNDARY label.
"""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu.features import (
    organized_edge_detection,
    edge_label_indices,
    EDGELABEL_NAN_BOUNDARY,
    EDGELABEL_OCCLUDING,
    EDGELABEL_OCCLUDED,
)


def _squares_cloud():
    INNER = 50
    OUTER = 2 * INNER
    BASE = 2.0
    DISC = 0.02
    RES = 0.01
    ctr_o, ctr_i = OUTER // 2, INNER // 2
    left, right = ctr_o - ctr_i, ctr_o + ctr_i
    top, bottom = ctr_o - ctr_i, ctr_o + ctr_i
    xyz = np.zeros((OUTER, OUTER, 3), np.float32)
    outer_perim, inner_perim = set(), set()
    for row in range(OUTER):
        for col in range(OUTER):
            depth = BASE
            if left <= col < right and top <= row < bottom:
                depth = BASE - DISC
                if col in (left, right - 1) or row in (top, bottom - 1):
                    outer_perim.add(row * OUTER + col)
            if ((row in (top - 1, bottom) and left - 1 <= col <= right)
                    or (top <= row < bottom and col in (left - 1, right))):
                inner_perim.add(row * OUTER + col)
            xyz[row, col] = ((col - ctr_o) * RES, (row - ctr_i) * RES, depth)
    return xyz, outer_perim, inner_perim, DISC / (BASE * 1.1)


def test_occluding_and_occluded_edges():
    xyz, outer_perim, inner_perim, th = _squares_cloud()
    H, W, _ = xyz.shape
    c = make_cloud(jnp.asarray(xyz.reshape(-1, 3)), width=W, height=H)
    labels = organized_edge_detection(
        c, depth_discon_threshold=th, max_search_neighbors=8,
        edge_types=EDGELABEL_OCCLUDING | EDGELABEL_OCCLUDED)
    idx = edge_label_indices(labels)
    assert set(idx[1].tolist()) == outer_perim      # occluding
    assert set(idx[2].tolist()) == inner_perim      # occluded


def test_nan_boundary_and_across_nan_march():
    # background plane at 2.0 with a NaN band; a near plane at 1.9 on the
    # other side of the band: pixels adjacent to the band must find the
    # corresponding depth across it (occluding/occluded), and pixels
    # adjacent to a WIDE unexplorable NaN region become NAN_BOUNDARY
    H = W = 40
    z = np.full((H, W), 2.0, np.float32)
    mask = np.ones((H, W), bool)
    z[:, 18:22] = np.nan
    mask[:, 18:22] = False
    z[:, 22:] = 1.9                     # near surface right of the band
    xyz = np.zeros((H, W, 3), np.float32)
    xyz[..., 0] = np.arange(W)[None, :] * 0.01
    xyz[..., 1] = np.arange(H)[:, None] * 0.01
    xyz[..., 2] = np.where(mask, z, 0.0)
    c = make_cloud(jnp.asarray(xyz.reshape(-1, 3)),
                   mask=jnp.asarray(mask.reshape(-1)), width=W, height=H)
    labels = np.asarray(organized_edge_detection(
        c, depth_discon_threshold=0.02, max_search_neighbors=10)
    ).reshape(H, W)
    # the far side of the band (col 17) sees corr depth 1.9 -> dist > 0
    assert (labels[2:-2, 17] & EDGELABEL_OCCLUDED).all()
    # the near side (col 22) sees corr 2.0 -> dist < 0 -> occluding
    assert (labels[2:-2, 22] & EDGELABEL_OCCLUDING).all()
    # a wide NaN region nobody can cross in max_search steps
    z2 = np.full((H, W), 2.0, np.float32)
    m2 = np.ones((H, W), bool)
    m2[:, 10:] = False                  # half the image invalid
    xyz2 = xyz.copy(); xyz2[..., 2] = np.where(m2, z2, 0.0)
    c2 = make_cloud(jnp.asarray(xyz2.reshape(-1, 3)),
                    mask=jnp.asarray(m2.reshape(-1)), width=W, height=H)
    lab2 = np.asarray(organized_edge_detection(
        c2, depth_discon_threshold=0.02, max_search_neighbors=5)
    ).reshape(H, W)
    assert (lab2[1:-1, 9] & EDGELABEL_NAN_BOUNDARY).all()
