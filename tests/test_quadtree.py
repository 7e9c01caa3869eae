"""MapQuadtree strategy: candidate supersets post-filtered to the same
exact sets as GridIndex, and the split-at-11 / no-size-reduction rules."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2world_ray.geo.gridindex import GridIndex
from osm2world_ray.geo.quadtree import LEAF_SPLIT_SIZE, QuadTreeIndex, _Node


def _boxes(seed, n):
    rng = np.random.RandomState(seed)
    minx = rng.uniform(-10, 10, n)
    miny = rng.uniform(-10, 10, n)
    return minx, miny, minx + rng.uniform(0.01, 3, n), miny + rng.uniform(0.01, 3, n)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 1000), st.integers(1, 80))
def test_point_probe_matches_grid(seed, n):
    minx, miny, maxx, maxy = _boxes(seed, n)
    qt = QuadTreeIndex(minx, miny, maxx, maxy)
    gr = GridIndex(minx, miny, maxx, maxy, n_cells_hint=8)
    rng = np.random.RandomState(seed + 1)
    px = rng.uniform(-11, 12, 200)
    py = rng.uniform(-11, 12, 200)
    a = set(zip(*map(lambda x: x.tolist(), qt.probe_points(px, py))))
    b = set(zip(*map(lambda x: x.tolist(), gr.probe_points(px, py))))
    assert a == b


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 1000), st.integers(1, 60))
def test_bbox_probe_matches_grid(seed, n):
    minx, miny, maxx, maxy = _boxes(seed, n)
    qt = QuadTreeIndex(minx, miny, maxx, maxy)
    gr = GridIndex(minx, miny, maxx, maxy, n_cells_hint=8)
    qx0, qy0, qx1, qy1 = _boxes(seed + 7, 50)
    a = set(zip(*map(lambda x: x.tolist(), qt.probe_bbox(qx0, qy0, qx1, qy1))))
    b = set(zip(*map(lambda x: x.tolist(), gr.probe_bbox(qx0, qy0, qx1, qy1))))
    assert a == b


def _max_leaf(node: _Node) -> int:
    if node.children is None:
        return len(node.elements)
    return max(_max_leaf(c) for c in node.children)


def test_leaves_split_at_threshold():
    # scattered unit points: leaves must split below the threshold
    rng = np.random.RandomState(3)
    x = rng.uniform(0, 100, 400)
    y = rng.uniform(0, 100, 400)
    qt = QuadTreeIndex(x, y, x + 1e-6, y + 1e-6)
    assert _max_leaf(qt.root) < LEAF_SPLIT_SIZE


def test_identical_boxes_do_not_split_forever():
    # 30 coincident boxes: every prospective child quadrant touching
    # them touches all -> the no-size-reduction guard keeps a fat leaf
    n = 30
    minx = np.full(n, 1.0)
    miny = np.full(n, 1.0)
    qt = QuadTreeIndex(minx, miny, minx + 0.5, miny + 0.5)
    assert _max_leaf(qt.root) == n
