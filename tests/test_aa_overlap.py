"""Area x area typed overlap kernels (addOverlapBetween(MapArea, MapArea))."""

import numpy as np

from osm2world_ray.stages.aa_overlap import _classify


def _one(a, b):
    args = [np.array([v], dtype=np.float64) for v in (*a, *b)]
    return int(_classify(*args)[0])


def test_share_segment_short_circuit():
    # shared full right/left edge with equal y extent
    assert _one((0, 1, 0, 1), (1, 2, 0, 1)) == 1
    # shared full top/bottom edge
    assert _one((0, 1, 0, 1), (0, 1, 1, 2)) == 1


def test_containment_both_directions():
    assert _one((1, 2, 1, 2), (0, 5, 0, 5)) == 2  # a in b
    assert _one((0, 5, 0, 5), (1, 2, 1, 2)) == 3  # b in a


def test_proper_intersection():
    assert _one((0, 2, 0, 2), (1, 3, 1, 3)) == 4


def test_corner_touch_is_excluded():
    """Touch at a single shared corner node: intersection positions all
    within 0.01 of the common node -> no overlap (:671-681)."""
    assert _one((0, 1, 0, 1), (1, 2, 1, 2)) == 0


def test_disjoint_is_nothing():
    assert _one((0, 1, 0, 1), (5, 6, 5, 6)) == 0


def test_containment_beats_intersect_priority():
    """Reference emits CONTAIN when containment holds even if the
    intersect flag was computed (:698-706); with a contained rect
    touching nothing the intersect flag is false anyway, so exercise
    priority with a shared-node contained rect just inside."""
    # inner rect shares no nodes, strictly inside -> CONTAIN
    assert _one((0.1, 0.9, 0.1, 0.9), (0, 1, 0, 1)) == 2
