"""Octree traversal iterators over the linear (sorted-morton) octree.

Equivalents of the reference's octree iterator family (reference:
octree/include/pcl/octree/octree_iterator.h — OctreeDepthFirstIterator,
OctreeLeafNodeDepthFirstIterator, OctreeBreadthFirstIterator,
OctreeFixedDepthIterator, OctreeLeafNodeBreadthFirstIterator; semantics
pinned by test/octree/test_octree_iterator.cpp's traversal-order and
per-depth-count expectations).

The pointer octree's iterators walk parent/child links; the linear
octree's sorted morton keys make every traversal a prefix computation:

- a node at depth d is a distinct key prefix (key >> 3*(depth - d));
- depth-first PREORDER is exactly ascending (prefix, depth) with parents
  before children — sorted leaf keys visited with their prefix stack;
- breadth-first is the same set sorted by (depth, prefix).

Each iterator yields ``OctreeNode(key, depth, is_leaf)`` where ``key``
is the morton prefix at that node's depth. Host-side generators (numpy)
— iteration is an inherently sequential host-facing API; batch consumers
use ``at_depth``/``leaf_centroids`` on device instead.
"""

from __future__ import annotations

from typing import Iterator, List, NamedTuple

import numpy as np

from pcl_tpu.octree.linear import LinearOctree


class OctreeNode(NamedTuple):
    key: int        # morton prefix at this node's depth
    depth: int      # 0 = root
    is_leaf: bool


def _leaf_keys(tree: LinearOctree) -> np.ndarray:
    keys = np.asarray(tree.keys)
    mask = np.asarray(tree.mask)
    k = keys[mask]
    return np.unique(k)


def _all_nodes(tree: LinearOctree) -> List[np.ndarray]:
    """Unique node prefixes per depth: [depth] -> sorted prefix array."""
    leaves = _leaf_keys(tree)
    out = []
    for d in range(tree.depth + 1):
        out.append(np.unique(leaves >> (3 * (tree.depth - d))))
    return out


def leaf_iterator(tree: LinearOctree) -> Iterator[OctreeNode]:
    """Leaf-node depth-first iterator (OctreeLeafNodeDepthFirstIterator):
    ascending morton order IS the preorder leaf sequence."""
    for k in _leaf_keys(tree):
        yield OctreeNode(int(k), tree.depth, True)


def depth_first_iterator(tree: LinearOctree) -> Iterator[OctreeNode]:
    """Full preorder depth-first traversal (OctreeDepthFirstIterator):
    every branch node immediately before its children, children in
    ascending octant order."""
    leaves = _leaf_keys(tree)
    max_d = tree.depth

    def walk(prefix: int, depth: int, lo: int, hi: int):
        yield OctreeNode(prefix, depth, depth == max_d)
        if depth == max_d:
            return
        shift = 3 * (max_d - depth - 1)
        child = (leaves[lo:hi] >> shift)
        for oct_ in np.unique(child):
            s = lo + int(np.searchsorted(child, oct_, "left"))
            e = lo + int(np.searchsorted(child, oct_, "right"))
            yield from walk(int(oct_), depth + 1, s, e)

    if len(leaves):
        yield from walk(0, 0, 0, len(leaves))


def breadth_first_iterator(tree: LinearOctree) -> Iterator[OctreeNode]:
    """Breadth-first traversal (OctreeBreadthFirstIterator): depths
    ascending, ascending prefix order within a depth."""
    nodes = _all_nodes(tree)
    for d, prefixes in enumerate(nodes):
        if len(_leaf_keys(tree)) == 0:
            return
        for p in prefixes:
            yield OctreeNode(int(p), d, d == tree.depth)


def fixed_depth_iterator(tree: LinearOctree, depth: int
                         ) -> Iterator[OctreeNode]:
    """All nodes of one depth (OctreeFixedDepthIterator)."""
    if depth < 0 or depth > tree.depth:
        raise ValueError(f"depth {depth} outside [0, {tree.depth}]")
    leaves = _leaf_keys(tree)
    for p in np.unique(leaves >> (3 * (tree.depth - depth))):
        yield OctreeNode(int(p), depth, depth == tree.depth)


def leaf_breadth_first_iterator(tree: LinearOctree
                                ) -> Iterator[OctreeNode]:
    """Leaves in breadth-first order (OctreeLeafNodeBreadthFirstIterator)
    — all leaves live at the same depth in the linear octree, so this is
    ascending key order like the depth-first leaf iterator."""
    yield from leaf_iterator(tree)


def node_counts_per_depth(tree: LinearOctree) -> List[int]:
    """#nodes at each depth 0..max (the per-depth count assertions of
    test_octree_iterator.cpp)."""
    return [len(p) for p in _all_nodes(tree)]
