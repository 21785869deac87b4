"""Recognition tests — LINEMOD, ISM, trimmed ICP, ObjRecRANSAC, distance map."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud
from pcl_tpu import features
from pcl_tpu.recognition import (
    build_modality_maps,
    spread_quantized_map,
    extract_template,
    detect_templates,
    train_ism,
    find_objects,
    find_strongest_peaks,
    save_ism_model,
    load_ism_model,
    trimmed_icp,
    obj_rec_ransac,
    distance_map,
)


def _synthetic_frame(cx, cy):
    """RGB+depth frame with a bright textured square at (cy, cx)."""
    H, W = 64, 64
    rgb = np.full((H, W, 3), 30.0, np.float32)
    depth = np.full((H, W), 2.0, np.float32)
    yy, xx = np.mgrid[0:16, 0:16]
    patch = 100.0 + 100.0 * ((xx // 2 + yy // 2) % 2)  # checkerboard
    rgb[cy : cy + 16, cx : cx + 16] = patch[..., None]
    depth[cy : cy + 16, cx : cx + 16] = 1.0
    fx = fy = 60.0
    u = (np.arange(W) - W / 2) / fx
    v = (np.arange(H) - H / 2) / fy
    xyz = np.stack(
        [u[None, :] * depth, v[:, None] * depth, depth], -1
    ).astype(np.float32)
    return rgb, xyz, np.ones((H, W), bool)


class TestLinemod:
    def test_detect_translated(self):
        rgb, xyz, valid = _synthetic_frame(10, 12)
        qmaps = build_modality_maps(rgb, xyz, valid)
        tmpl = extract_template(qmaps, (12, 10, 16, 16), n_features=40)

        rgb2, xyz2, valid2 = _synthetic_frame(34, 28)
        sg = np.asarray(spread_quantized_map(jnp.asarray(
            build_modality_maps(rgb2, xyz2, valid2)[0])))
        sn = np.asarray(spread_quantized_map(jnp.asarray(
            build_modality_maps(rgb2, xyz2, valid2)[1])))
        dets = detect_templates([sg, sn], [tmpl], threshold=0.7)
        assert dets, "no detections"
        d = dets[0]
        assert abs(d.y - 28) <= 4 and abs(d.x - 34) <= 4
        assert d.score > 0.7


class TestISM:
    @staticmethod
    def _ring(center):
        th = np.linspace(0, 2 * np.pi, 40, endpoint=False)
        pts = center + np.stack(
            [np.cos(th), np.sin(th), np.zeros_like(th)], 1
        ).astype(np.float32)
        # +Y normals: alignYCoordWithNormal is the identity there, so the
        # corresponding-keypoint votes land exactly on the object center
        nrm = np.tile(np.float32([0.0, 1.0, 0.0]), (len(th), 1))
        return pts, nrm

    @staticmethod
    def _feature_fn(pts, nrm):
        # translation-invariant angle embedding about the cloud's centroid
        c = pts.mean(axis=0)
        th = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        return np.stack(
            [np.cos(th) + 2.0, np.sin(th) + 2.0], 1).astype(np.float32)

    def test_center_votes(self, rng, tmp_path):
        p1, n1 = self._ring(np.array([0.0, 0, 0], np.float32))
        model = train_ism([p1], [n1], [0], self._feature_fn,
                          sampling_size=0.05, n_clusters=8)
        # per-class sigma from the centered cloud's extent (~radius/10)
        sigma = float(model.sigmas[0])
        assert 0.05 < sigma < 0.2

        # reference text-format round trip
        path = str(tmp_path / "ring.ism")
        save_ism_model(model, path)
        model2 = load_ism_model(path)
        np.testing.assert_allclose(
            model2.statistical_weights, model.statistical_weights,
            rtol=1e-4)
        np.testing.assert_allclose(
            model2.directions_to_center, model.directions_to_center,
            rtol=1e-4, atol=1e-6)
        assert model2.clusters == model.clusters

        # scene: same object moved; identical normals -> exact votes
        p2, n2 = self._ring(np.array([3.0, 1.0, 0], np.float32))
        votes, strengths, _ = find_objects(
            model2, p2, n2, 0, self._feature_fn, sampling_size=0.05)
        assert len(votes) > 0
        peaks = find_strongest_peaks(
            votes, strengths, 0, non_maxima_radius=sigma * 10.0,
            sigma=sigma)
        assert peaks
        center, dens = peaks[0]
        assert dens > 0
        assert np.linalg.norm(center - [3.0, 1.0, 0]) < 0.3


class TestTrimmedICP:
    def test_partial_overlap(self, rng):
        tgt = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
        # source = subset + outlier block far away
        src_in = tgt[:250] + np.float32([0.05, -0.02, 0.03])
        out = rng.uniform(5, 6, (150, 3)).astype(np.float32)
        src = np.concatenate([src_in, out])
        res = trimmed_icp(
            make_cloud(jnp.asarray(src)), make_cloud(jnp.asarray(tgt)),
            trim_fraction=0.5, max_iterations=40,
        )
        T = np.asarray(res.transform)
        np.testing.assert_allclose(
            T[:3, 3], [-0.05, 0.02, -0.03], atol=5e-3
        )
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=5e-3)


class TestObjRecRansac:
    def test_recover_pose(self, rng):
        # model: box surface points with outward normals
        n = 300
        pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        ax = rng.integers(0, 3, n)
        sgn = rng.choice([-1.0, 1.0], n)
        pts[np.arange(n), ax] = 0.5 * sgn
        nrm = np.zeros((n, 3), np.float32)
        nrm[np.arange(n), ax] = sgn
        model = make_cloud(jnp.asarray(pts)).with_attrs(normal=jnp.asarray(nrm))

        ang = 0.4
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
            np.float32,
        )
        t = np.float32([1.0, -0.5, 0.3])
        spts = pts @ R.T + t
        snrm = nrm @ R.T
        scene = make_cloud(jnp.asarray(spts)).with_attrs(normal=jnp.asarray(snrm))

        T, support = obj_rec_ransac(
            model, scene, pair_dist=0.8, n_hypotheses=512, dist_tol=0.08,
            inlier_dist=0.05, seed=1,
        )
        assert support > 0.8
        np.testing.assert_allclose(T[:3, :3], R, atol=0.05)
        np.testing.assert_allclose(T[:3, 3], t, atol=0.05)


class TestDistanceMap:
    def test_single_point(self):
        m = np.zeros((16, 16), bool)
        m[8, 8] = True
        d = np.asarray(distance_map(jnp.asarray(m)))
        assert d[8, 8] == 0
        np.testing.assert_allclose(d[8, 12], 4.0, atol=1e-4)
        np.testing.assert_allclose(d[5, 4], 5.0, atol=1e-4)

    def test_matches_bruteforce(self, rng):
        m = rng.uniform(size=(20, 20)) < 0.1
        m[0, 0] = True
        d = np.asarray(distance_map(jnp.asarray(m)))
        yy, xx = np.nonzero(m)
        gy, gx = np.mgrid[0:20, 0:20]
        brute = np.sqrt(
            ((gy[..., None] - yy) ** 2 + (gx[..., None] - xx) ** 2).min(-1)
        )
        np.testing.assert_allclose(d, brute, atol=1e-3)


class TestFaceDetection:
    """RF depth face detection pipeline (reference recognition/
    face_detection: forest over integral-image depth features + sliding
    window)."""

    @staticmethod
    def _head_patch(rng, patch=24, r=9.0):
        """Spherical bump (head-like) on a far background."""
        y, x = np.meshgrid(np.arange(patch), np.arange(patch), indexing="ij")
        cy = patch / 2 + rng.uniform(-2, 2)
        cx = patch / 2 + rng.uniform(-2, 2)
        d2 = (y - cy) ** 2 + (x - cx) ** 2
        z = np.where(d2 < r * r, 1.0 - 0.3 * np.sqrt(np.maximum(r * r - d2, 0)) / r,
                     2.0)
        return (z + rng.normal(scale=0.01, size=z.shape)).astype(np.float32)

    @staticmethod
    def _clutter_patch(rng, patch=24):
        """Planar/ramp clutter."""
        y, x = np.meshgrid(np.arange(patch), np.arange(patch), indexing="ij")
        a, b = rng.uniform(-0.02, 0.02, 2)
        z = 1.5 + a * x + b * y
        return (z + rng.normal(scale=0.01, size=z.shape)).astype(np.float32)

    def test_train_and_detect(self, rng):
        from pcl_tpu.recognition.face_detection import (
            train_face_detector, detect_faces)
        pos = [self._head_patch(rng) for _ in range(40)]
        neg = [self._clutter_patch(rng) for _ in range(40)]
        det = train_face_detector(pos, neg, n_trees=8, depth=6)

        # scene: background ramp with one head at (12, 30)
        H, W = 48, 64
        y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        scene = (1.5 + 0.005 * x).astype(np.float32)
        head = self._head_patch(rng)
        scene[12:36, 30:54] = head
        found = detect_faces(det, scene, stride=3, threshold=0.6)
        assert found, "no detection"
        best = found[0]
        assert abs(best.y - 12) <= 6 and abs(best.x - 30) <= 6, found

        # clean ramp scene: no detections
        empty = detect_faces(det, (1.5 + 0.004 * y).astype(np.float32),
                             stride=3, threshold=0.6)
        assert len(empty) == 0, empty
