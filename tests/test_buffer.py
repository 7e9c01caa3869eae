"""Mitre-join convex buffer tests (JTSBufferUtil.java:19-32 analogue)."""

import numpy as np
import pytest

from osm2world_ray.geo.buffer import buffer_convex_ring, is_convex


def area(ring):
    x, y = ring[:, 0], ring[:, 1]
    return abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2


SQUARE = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
DIAMOND = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=float)


def test_square_grow():
    out = buffer_convex_ring(SQUARE, 0.5)
    # mitre buffer of a square side s by d -> square side s + 2d
    assert abs(area(out) - 9.0) < 1e-12
    assert out[:, 0].min() == pytest.approx(-0.5)
    assert out[:, 0].max() == pytest.approx(2.5)


def test_square_shrink():
    out = buffer_convex_ring(SQUARE, -0.5)
    assert abs(area(out) - 1.0) < 1e-12


def test_square_shrink_collapse_raises():
    with pytest.raises(ValueError):
        buffer_convex_ring(SQUARE, -1.5)


def test_diamond_grow():
    out = buffer_convex_ring(DIAMOND, 0.5)
    # 90-degree mitre corners move out by d*sqrt(2): r' = 1 + 0.5*sqrt(2)
    r = 1 + 0.5 * np.sqrt(2)
    assert abs(area(out) - 2 * r * r) < 1e-12


def test_cw_input_normalized():
    out = buffer_convex_ring(SQUARE[::-1], 0.5)
    assert abs(area(out) - 9.0) < 1e-12


def test_non_convex_rejected():
    L = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=float)
    assert not is_convex(L)
    with pytest.raises(ValueError):
        buffer_convex_ring(L, 0.1)
