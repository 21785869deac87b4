"""Octree iterator semantics — mirrors the traversal-order and per-depth
count properties of reference test/octree/test_octree_iterator.cpp on
the linear octree."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.octree import linear
from pcl_tpu.octree.iterators import (
    leaf_iterator,
    depth_first_iterator,
    breadth_first_iterator,
    fixed_depth_iterator,
    leaf_breadth_first_iterator,
    node_counts_per_depth,
)


def _tree(n=500, depth=4, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    res = 1.0 / (1 << depth)
    return linear.build(jnp.asarray(pts), jnp.ones(n, bool), res,
                        origin=jnp.zeros(3), depth=depth)


def test_leaf_iterator_is_sorted_unique():
    t = _tree()
    ks = [n.key for n in leaf_iterator(t)]
    assert ks == sorted(ks)
    assert len(ks) == len(set(ks))
    assert len(ks) == int(t.leaf_count)
    assert all(n.is_leaf and n.depth == t.depth for n in leaf_iterator(t))


def test_depth_first_preorder():
    t = _tree()
    seq = list(depth_first_iterator(t))
    # root first
    assert seq[0] == (0, 0, False)
    # parent immediately precedes its first child; every node's parent
    # appears earlier
    seen = set()
    stack_ok = True
    for node in seq:
        if node.depth > 0:
            parent = (node.key >> 3, node.depth - 1)
            stack_ok &= parent in seen
        seen.add((node.key, node.depth))
    assert stack_ok
    # children visited in ascending octant order: the leaf subsequence is
    # ascending morton order
    leaf_seq = [n.key for n in seq if n.is_leaf]
    assert leaf_seq == [n.key for n in leaf_iterator(t)]
    # node total matches the per-depth counts
    assert len(seq) == sum(node_counts_per_depth(t))


def test_breadth_first_levels():
    t = _tree()
    seq = list(breadth_first_iterator(t))
    depths = [n.depth for n in seq]
    assert depths == sorted(depths)
    counts = node_counts_per_depth(t)
    for d in range(t.depth + 1):
        level = [n.key for n in seq if n.depth == d]
        assert level == sorted(level)
        assert len(level) == counts[d]
    # same node set as depth-first
    assert set(seq) == set(depth_first_iterator(t))


def test_fixed_depth_matches_at_depth():
    t = _tree()
    for d in (0, 1, 2, t.depth):
        ours = [n.key for n in fixed_depth_iterator(t, d)]
        keys, first = linear.at_depth(t, d)
        keys = np.asarray(keys)[np.asarray(first)]
        np.testing.assert_array_equal(ours, np.sort(keys))


def test_leaf_breadth_first_equals_leaf_order():
    t = _tree()
    assert list(leaf_breadth_first_iterator(t)) == list(leaf_iterator(t))
