"""Convex-polygon boolean intersection kernel (CAGUtil intersect
analogue) tests."""

import numpy as np

from osm2world_ray.geo.clip import clip_ring_to_convex, clip_ring_to_rect


def shoelace(ring):
    if len(ring) < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2


DIAMOND = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=float)
SQUARE01 = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)


def test_diamond_cap_square_is_triangle():
    out = clip_ring_to_convex(DIAMOND, SQUARE01)
    assert abs(shoelace(out) - 0.5) < 1e-12
    # and symmetric
    out2 = clip_ring_to_convex(SQUARE01, DIAMOND)
    assert abs(shoelace(out2) - 0.5) < 1e-12


def test_matches_rect_clip():
    ring = np.array([[-2, -1], [3, -1], [3, 2], [-2, 2]], dtype=float)
    a = clip_ring_to_rect(ring, 0.0, 0.0, 1.0, 1.0)
    b = clip_ring_to_convex(ring, SQUARE01)
    assert abs(shoelace(a) - shoelace(b)) < 1e-12
    assert abs(shoelace(a) - 1.0) < 1e-12


def test_offset_diamonds():
    d2 = DIAMOND + np.array([1.0, 0.0])
    out = clip_ring_to_convex(DIAMOND, d2)
    assert abs(shoelace(out) - 0.5) < 1e-12


def test_disjoint_is_empty():
    far = SQUARE01 + np.array([10.0, 0.0])
    assert len(clip_ring_to_convex(DIAMOND, far)) == 0


def test_contained_unchanged_area():
    small = SQUARE01 * 0.2 + np.array([0.1, 0.1])
    out = clip_ring_to_convex(small, DIAMOND)
    assert abs(shoelace(out) - shoelace(small)) < 1e-15


def test_cw_clip_winding_normalized():
    out = clip_ring_to_convex(DIAMOND, SQUARE01[::-1])
    assert abs(shoelace(out) - 0.5) < 1e-12
