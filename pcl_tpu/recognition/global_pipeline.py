"""Global recognition pipeline — the 3d_rec_framework capability.

Re-design of the reference's global pipelines (reference:
apps/3d_rec_framework/include/pcl/apps/3d_rec_framework/pipeline/
global_nn_classifier.h, global_nn_recognizer_cvfh.h and the training
tool global_classification.cpp): train a database of per-view GLOBAL
descriptors (VFH / CVFH / ESF) from rendered views of each model, then
recognize scene clusters by nearest-neighbor descriptor lookup, roll-
histogram (CRH) alignment, ICP pose refinement, and greedy hypothesis
verification.

TPU shape: every view's descriptor is one batched feature pass; the
descriptor database is a dense [V, D] matrix so classification of all
scene clusters is ONE matmul (the reference walks a FLANN tree per
cluster); pose refinement is the jitted ICP loop.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, from_numpy, to_numpy


def _descriptor(cloud: Cloud, kind: str) -> np.ndarray:
    from pcl_tpu import features
    if kind == "vfh":
        c = features.estimate_normals(cloud, k=16)
        return np.asarray(features.estimate_vfh(c))
    if kind == "esf":
        return np.asarray(features.estimate_esf(cloud))
    raise ValueError(f"unknown global descriptor {kind!r} (vfh/esf)")


def render_views(xyz: np.ndarray, n_views: int = 8,
                 max_points: int = 4096, seed: int = 0) -> List[dict]:
    """Partial views of a model from a ring of virtual viewpoints (the
    3d_rec_framework's vtk view rendering analog): for each azimuth the
    half of the model facing the camera survives (z-buffer-free hidden-
    surface cull via the facing hemisphere), expressed in the VIEW frame.
    Returns [{"xyz", "pose"}] with pose mapping view -> model frame."""
    rng = np.random.default_rng(seed)
    ctr = xyz.mean(0)
    out = []
    for v in range(n_views):
        az = 2 * np.pi * v / n_views
        dirv = np.array([np.cos(az), np.sin(az), 0.3], np.float64)
        dirv /= np.linalg.norm(dirv)
        # facing hemisphere = points whose outward radial direction has
        # positive dot with the view direction
        rad = xyz - ctr
        vis = rad @ dirv > -0.1 * np.linalg.norm(rad, axis=1)
        pts = xyz[vis]
        if len(pts) > max_points:
            pts = pts[rng.choice(len(pts), max_points, replace=False)]
        # view frame: z toward the model
        z = -dirv
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= max(np.linalg.norm(x), 1e-9)
        y = np.cross(z, x)
        R = np.stack([x, y, z])               # rows = view axes
        eye = ctr + 2.5 * dirv * max(np.linalg.norm(rad, axis=1).max(), 1e-6)
        local = (pts - eye) @ R.T
        pose = np.eye(4)
        pose[:3, :3] = R.T                    # view -> model rotation
        pose[:3, 3] = eye
        out.append({"xyz": local.astype(np.float32), "pose": pose})
    return out


@dataclass
class GlobalModelDatabase:
    """Trained per-view descriptor database (the flann index + pose files
    the reference persists per model, global_nn_classifier.h)."""
    descriptor: str                                   # 'vfh' | 'esf'
    labels: List[str] = field(default_factory=list)   # per view
    descs: Optional[np.ndarray] = None                # [V, D]
    views: List[np.ndarray] = field(default_factory=list)   # view clouds
    poses: List[np.ndarray] = field(default_factory=list)   # view->model

    def save(self, root: str) -> None:
        os.makedirs(root, exist_ok=True)
        np.save(os.path.join(root, "descs.npy"), self.descs)
        for i, (v, p) in enumerate(zip(self.views, self.poses)):
            np.save(os.path.join(root, f"view_{i:04d}.npy"), v)
            np.save(os.path.join(root, f"pose_{i:04d}.npy"), p)
        with open(os.path.join(root, "meta.json"), "w") as f:
            json.dump({"descriptor": self.descriptor,
                       "labels": self.labels}, f)

    @classmethod
    def load(cls, root: str) -> "GlobalModelDatabase":
        with open(os.path.join(root, "meta.json")) as f:
            meta = json.load(f)
        db = cls(descriptor=meta["descriptor"], labels=meta["labels"])
        db.descs = np.load(os.path.join(root, "descs.npy"))
        db.views = [np.load(os.path.join(root, f"view_{i:04d}.npy"))
                    for i in range(len(db.labels))]
        db.poses = [np.load(os.path.join(root, f"pose_{i:04d}.npy"))
                    for i in range(len(db.labels))]
        return db


def train_global_database(
    models: Dict[str, np.ndarray],
    descriptor: str = "vfh",
    n_views: int = 8,
    seed: int = 0,
) -> GlobalModelDatabase:
    """Render views of every model and compute their global descriptors
    (the reference's 'source' + trainer flow, global_classification.cpp)."""
    db = GlobalModelDatabase(descriptor=descriptor)
    descs = []
    for name, xyz in models.items():
        for view in render_views(np.asarray(xyz, np.float32),
                                 n_views=n_views, seed=seed):
            c = from_numpy(view["xyz"])
            descs.append(_descriptor(c, descriptor).reshape(-1))
            db.labels.append(name)
            db.views.append(view["xyz"])
            db.poses.append(view["pose"])
    db.descs = np.stack(descs)
    return db


@dataclass(frozen=True)
class GlobalRecognition:
    label: str
    view_index: int
    distance: float          # descriptor chi^2/L2 distance
    transform: np.ndarray    # [4,4] mapping the matched view onto the
                             # scene cluster (after ICP refinement)
    fitness: float           # refined ICP fitness (mean sq corr dist)


def _chi2(a: np.ndarray, B: np.ndarray) -> np.ndarray:
    num = (a[None, :] - B) ** 2
    den = a[None, :] + B + 1e-12
    return 0.5 * (num / den).sum(axis=1)


def recognize_clusters(
    db: GlobalModelDatabase,
    clusters: List[np.ndarray],
    n_candidates: int = 3,
    refine_iterations: int = 30,
    max_corr_frac: float = 0.5,
) -> List[Optional[GlobalRecognition]]:
    """Classify + pose every scene cluster: descriptor NN (one matmul-ish
    chi^2 against the whole database), centroid pre-alignment, ICP
    refinement of the best ``n_candidates`` views, keep the best fitness
    (the reference's global_nn_recognizer flow: NN -> CRH roll ->
    ICP -> HV)."""
    from pcl_tpu.registration.icp import icp

    out: List[Optional[GlobalRecognition]] = []
    for pts in clusters:
        pts = np.asarray(pts, np.float32)
        if len(pts) < 10:
            out.append(None)
            continue
        d = _descriptor(from_numpy(pts), db.descriptor).reshape(-1)
        dist = _chi2(d, db.descs)
        cand = np.argsort(dist)[:n_candidates]
        best: Optional[GlobalRecognition] = None
        diam = float(np.linalg.norm(pts.max(0) - pts.min(0)))
        for vi in cand:
            view = db.views[int(vi)]
            # centroid pre-alignment (the reference seeds ICP from the
            # CRH-aligned centroid transform)
            shift = pts.mean(0) - view.mean(0)
            pre = np.eye(4, dtype=np.float32)
            pre[:3, 3] = shift
            res = icp(from_numpy(view), from_numpy(pts),
                      init_transform=jnp.asarray(pre),
                      max_corr_dist=max_corr_frac * diam,
                      max_iterations=refine_iterations)
            fit = float(res.fitness)
            if best is None or fit < best.fitness:
                best = GlobalRecognition(
                    label=db.labels[int(vi)], view_index=int(vi),
                    distance=float(dist[vi]),
                    transform=np.asarray(res.transform), fitness=fit)
        out.append(best)
    return out


def segment_scene_clusters(
    scene: Cloud,
    plane_threshold: float = 0.02,
    cluster_tolerance: float = 0.05,
    min_cluster_size: int = 50,
    max_clusters: int = 8,
    key=None,
) -> List[np.ndarray]:
    """Scene preprocessing of the reference pipeline: dominant-plane
    removal (table top) + euclidean clustering -> candidate object
    clusters."""
    import jax
    from pcl_tpu import sac
    from pcl_tpu.segmentation import sac_segmentation, euclidean_clusters

    if key is None:
        key = jax.random.PRNGKey(0)
    res = sac_segmentation(scene, sac.PlaneModel(), plane_threshold, key=key)
    above = scene.with_mask(scene.mask & ~res.inliers)
    labels, n = euclidean_clusters(above, cluster_tolerance,
                                   min_cluster_size=min_cluster_size)
    lab = np.asarray(labels)
    xyz = np.asarray(scene.xyz)
    sizes = [(l, int((lab == l).sum()))
             for l in sorted(set(lab[lab >= 0].tolist()))]
    sizes.sort(key=lambda kv: -kv[1])
    return [xyz[lab == l] for l, _n in sizes[:max_clusters]]
