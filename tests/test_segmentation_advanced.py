"""Segmentation tests — min-cut, grabcut, organized multi-plane, prism,
LCCP/CPC, seeded hue, random walker, unary classifier."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu.segmentation import (
    min_cut_segmentation,
    grab_cut,
    organized_connected_components,
    organized_multi_plane_segmentation,
    extract_polygonal_prism,
    lccp_segmentation,
    seeded_hue_segmentation,
    random_walker,
    UnaryClassifier,
    supervoxel_clustering,
)


def _two_blobs(rng, n=150, sep=5.0):
    a = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    b = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32) + [sep, 0, 0]
    return a, b


class TestMinCut:
    def test_separates_blobs(self, rng):
        a, b = _two_blobs(rng)
        c = make_cloud(jnp.asarray(np.concatenate([a, b])))
        fg = min_cut_segmentation(
            c, foreground_point=np.zeros(3, np.float32), sigma=0.3, radius=2.0
        )
        assert fg[:150].mean() > 0.9
        assert fg[150:].mean() < 0.1


class TestGrabCut:
    def test_color_refinement(self, rng):
        # red blob + blue blob spatially adjacent; seed covers red + a bit of blue
        a = rng.normal(scale=0.3, size=(120, 3)).astype(np.float32)
        b = rng.normal(scale=0.3, size=(120, 3)).astype(np.float32) + [1.2, 0, 0]
        xyz = np.concatenate([a, b])
        rgb = np.zeros((240, 3), np.float32)
        rgb[:120, 0] = 1.0
        rgb[120:, 2] = 1.0
        c = make_cloud(jnp.asarray(xyz)).with_attrs(rgb=jnp.asarray(rgb))
        init = np.zeros(240, bool)
        init[:120] = True
        init[120:140] = True  # contaminated seed
        out = grab_cut(c, init, lam=10.0)
        assert out[:120].mean() > 0.9
        assert out[120:].mean() < 0.2


class TestOrganized:
    def test_connected_components(self):
        H, W = 16, 16
        xyz = np.zeros((H, W, 3), np.float32)
        xyz[..., 0] = np.arange(W)[None, :] * 0.01
        xyz[..., 1] = np.arange(H)[:, None] * 0.01
        xyz[:, 8:, 2] = 5.0  # depth jump splits left/right
        labels = np.asarray(
            organized_connected_components(
                jnp.asarray(xyz), jnp.ones((H, W), bool), distance_threshold=0.05
            )
        )
        assert len(np.unique(labels)) == 2
        assert (labels[:, :8] == labels[0, 0]).all()
        assert (labels[:, 8:] == labels[0, 8]).all()

    def test_multi_plane(self):
        H, W = 24, 24
        xs = np.arange(W)[None, :].repeat(H, 0) * 0.02
        ys = np.arange(H)[:, None].repeat(W, 1) * 0.02
        # floor z=1 on left, wall x-plane (z varies) on right
        xyz = np.stack([xs, ys, np.full((H, W), 1.0)], -1).astype(np.float32)
        normals = np.tile([0, 0, -1.0], (H, W, 1)).astype(np.float32)
        xyz[:, 12:, 2] = 1.0 + (xs[:, 12:] - xs[0, 12]) * 1.0  # slanted plane
        slant = np.array([-1.0, 0, 1.0]) / np.sqrt(2)
        normals[:, 12:] = -slant
        labels, regions = organized_multi_plane_segmentation(
            xyz, normals, np.ones((H, W), bool), min_inliers=50
        )
        assert len(regions) == 2
        assert {r.count for r in regions} == {24 * 12, 24 * 12}
        # refit normals match
        n0 = regions[0].coefficients[:3]
        assert abs(abs(n0[2]) - 1.0) < 0.05 or abs(n0 @ slant) > 0.95

    def test_polygonal_prism(self, rng):
        hull = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        pts = np.array(
            [[0.5, 0.5, 0.2], [0.5, 0.5, 0.9], [2.0, 0.5, 0.2], [0.5, 0.5, -0.1]],
            np.float32,
        )
        c = make_cloud(jnp.asarray(pts))
        m = extract_polygonal_prism(
            c, hull, np.array([0, 0, 1.0, 0]), height_min=0.0, height_max=0.5
        )
        assert m.tolist() == [True, False, False, False]


class TestLCCP:
    def test_convex_merge_concave_split(self, rng):
        # two planes meeting at a concave (inner) corner: should stay split
        n = 400
        a = np.stack(
            [rng.uniform(0, 1, n), rng.uniform(0, 1, n), np.zeros(n)], 1
        ).astype(np.float32)
        b = np.stack(
            [np.zeros(n), rng.uniform(0, 1, n), rng.uniform(0, 1, n)], 1
        ).astype(np.float32)
        xyz = np.concatenate([a, b])
        normals = np.concatenate(
            [np.tile([0, 0, 1.0], (n, 1)), np.tile([1.0, 0, 0], (n, 1))]
        ).astype(np.float32)
        c = make_cloud(jnp.asarray(xyz)).with_attrs(normal=jnp.asarray(normals))
        sv = supervoxel_clustering(c, seed_resolution=0.3, max_seeds=64)
        labels, seg = lccp_segmentation(sv, concavity_tolerance=0.17)
        la = labels[:n][labels[:n] >= 0]
        lb = labels[n:][labels[n:] >= 0]
        # dominant label on each plane differs (concave boundary not merged)
        da = np.bincount(la).argmax()
        db = np.bincount(lb).argmax()
        assert da != db


class TestSeededHue:
    def test_hue_gate(self, rng):
        pts = rng.uniform(0, 1, (200, 3)).astype(np.float32) * [2, 0.2, 0.2]
        rgb = np.zeros((200, 3), np.float32)
        red = pts[:, 0] < 1.0
        rgb[red] = [1, 0.1, 0.1]
        rgb[~red] = [0.1, 0.1, 1]
        c = make_cloud(jnp.asarray(pts)).with_attrs(rgb=jnp.asarray(rgb))
        seeds = np.zeros(200, bool)
        seeds[np.flatnonzero(red)[0]] = True
        out = np.asarray(
            seeded_hue_segmentation(
                c, jnp.asarray(seeds), cluster_tolerance=0.5, delta_hue=0.15
            )
        )
        assert out[red].mean() > 0.9
        assert out[~red].mean() < 0.1


class TestRandomWalker:
    def test_two_seeds(self, rng):
        a, b = _two_blobs(rng, n=100, sep=3.0)
        c = make_cloud(jnp.asarray(np.concatenate([a, b])))
        seeds = np.full(200, -1, np.int32)
        seeds[0] = 0
        seeds[100] = 1
        out = np.asarray(random_walker(c, jnp.asarray(seeds), sigma=0.5, n_labels=2))
        assert (out[:100] == 0).mean() > 0.95
        assert (out[100:] == 1).mean() > 0.95


class TestUnaryClassifier:
    def test_train_segment(self, rng):
        fa = rng.normal(size=(100, 8)).astype(np.float32)
        fb = rng.normal(size=(100, 8)).astype(np.float32) + 5.0
        clf = UnaryClassifier().train([fa, fb], clusters_per_class=4)
        pred = clf.segment(np.concatenate([fa[:10], fb[:10]]))
        assert (pred[:10] == 0).all() and (pred[10:] == 1).all()
