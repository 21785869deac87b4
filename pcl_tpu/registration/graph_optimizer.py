"""Pluggable pose-graph optimizer interface — the GraphOptimizer/GraphHandler
abstraction (reference: registration/include/pcl/registration/
graph_optimizer.h, graph_handler.h; in PCL only LUM implements it).

``PoseGraph`` owns vertices (scan poses) and edges (correspondence sets);
``optimize(method=...)`` dispatches to a registered backend. Backends:

  'lum'         dense 6Vx6V LUM solve       (registration/graph.py:lum)
  'lum_cg'      block-Jacobi CG, O(E) memory (lum(..., solver='cg'))
  'lum_sharded' edge-sharded CG over a mesh  (parallel/graph_sharded.py)
  'elch'        chain loop-closure distribution (graph.py:elch_distribute)

Register a custom backend with ``register_optimizer(name, fn)`` where
fn(graph: PoseGraph, **kw) -> [V,4,4] poses — the pluggable-interface hook
the reference declares but never exercises beyond LUM.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from pcl_tpu.registration import graph as _graph

_REGISTRY: Dict[str, Callable] = {}


def register_optimizer(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


class PoseGraph:
    """Vertex/edge container mirroring LUM's addPointCloud/setCorrespondences
    surface (reference lum.h:217,281) with a pluggable solve."""

    def __init__(self):
        self._poses: List[np.ndarray] = []
        self._edges: List[Tuple[int, int, np.ndarray, np.ndarray]] = []

    # -- construction ----------------------------------------------------
    def add_vertex(self, pose: Optional[np.ndarray] = None) -> int:
        """Add a scan vertex; returns its index (LUM addPointCloud)."""
        self._poses.append(
            np.eye(4, dtype=np.float32) if pose is None
            else np.asarray(pose, np.float32))
        return len(self._poses) - 1

    def add_edge(self, i: int, j: int, src_pts, dst_pts) -> None:
        """Correspondence edge: points of scan i matched to scan j
        (LUM setCorrespondences)."""
        self._edges.append((i, j, np.asarray(src_pts, np.float32),
                            np.asarray(dst_pts, np.float32)))

    @property
    def n_vertices(self) -> int:
        return len(self._poses)

    @property
    def n_edges(self) -> int:
        return len(self._edges)

    def poses(self) -> np.ndarray:
        return np.stack(self._poses) if self._poses else np.zeros((0, 4, 4))

    # -- solve -----------------------------------------------------------
    def optimize(self, method: str = "lum", **kw) -> np.ndarray:
        """Run the selected backend; updates and returns [V,4,4] poses."""
        if method not in _REGISTRY:
            raise ValueError(
                f"unknown optimizer {method!r}; have {sorted(_REGISTRY)}")
        new_poses = np.asarray(_REGISTRY[method](self, **kw))
        self._poses = [p for p in new_poses]
        return new_poses


def _prep(graph: PoseGraph, max_corr: Optional[int]):
    if max_corr is None:
        max_corr = max((len(s) for _, _, s, _ in graph._edges), default=1)
    pairs = [(i, j, s, d) for i, j, s, d in graph._edges]
    return (jnp.asarray(graph.poses()),
            *_graph.build_edges_from_correspondences(pairs, max_corr))


def _lum_backend(graph: PoseGraph, max_corr=None, solver="dense", **kw):
    P, es, ed, cs, cd, cv = _prep(graph, max_corr)
    res = _graph.lum(P, es, ed, cs, cd, cv, solver=solver, **kw)
    return res.poses


def _lum_cg_backend(graph: PoseGraph, max_corr=None, **kw):
    return _lum_backend(graph, max_corr=max_corr, solver="cg", **kw)


def _lum_sharded_backend(graph: PoseGraph, mesh=None, max_corr=None, **kw):
    from pcl_tpu.parallel.graph_sharded import sharded_lum
    from pcl_tpu.parallel.mesh import make_mesh
    if mesh is None:
        mesh = make_mesh()
    P, es, ed, cs, cd, cv = _prep(graph, max_corr)
    res = sharded_lum(mesh, P, es, ed, cs, cd, cv, **kw)
    return res.poses


def _elch_backend(graph: PoseGraph, loop_transform=None, **kw):
    if loop_transform is None:
        raise ValueError("elch backend needs loop_transform=")
    return _graph.elch_distribute(jnp.asarray(graph.poses()),
                                  jnp.asarray(loop_transform, jnp.float32))


register_optimizer("lum", _lum_backend)
register_optimizer("lum_cg", _lum_cg_backend)
register_optimizer("lum_sharded", _lum_sharded_backend)
register_optimizer("elch", _elch_backend)
