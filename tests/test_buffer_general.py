"""General mitre polygon buffer (JTSBufferUtil / JTS JOIN_MITRE)."""

import numpy as np

from osm2world_ray.geo.buffer import buffer_polygon_mitre


def test_square_closed_form():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    r = buffer_polygon_mitre(sq, 0.05)
    assert len(r) == 1 and len(r[0][1]) == 0
    assert abs(r[0][2] - (1 + 4 * 0.05 + 4 * 0.05**2)) < 1e-9


def test_concave_L_closed_form():
    """Reflex corner cancels one mitre term: A + P*d + (5-1)*d^2."""
    L = np.array([[0, 0], [0.6, 0], [0.6, 0.2], [0.3, 0.2], [0.3, 0.4], [0, 0.4]])
    r = buffer_polygon_mitre(L, 0.05)
    assert len(r) == 1 and len(r[0][1]) == 0
    assert abs(r[0][2] - (0.18 + 2.0 * 0.05 + 4 * 0.05**2)) < 1e-9


def test_winding_agnostic():
    sq_cw = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=float)
    r = buffer_polygon_mitre(sq_cw, 0.1)
    assert abs(r[0][2] - (1 + 0.4 + 0.04)) < 1e-9


def test_bay_closing_creates_hole():
    """A T-slot whose mouth is narrower than 2*d seals over and leaves
    the deep chamber as a hole (plus the mitre-plug island inside it)."""
    T = np.array(
        [[0, 0], [0.6, 0], [0.6, 0.4], [0.33, 0.4], [0.33, 0.25], [0.45, 0.25],
         [0.45, 0.1], [0.15, 0.1], [0.15, 0.25], [0.27, 0.25], [0.27, 0.4], [0, 0.4]]
    )
    r = buffer_polygon_mitre(T, 0.05)
    holes = sum(len(x[1]) for x in r)
    assert holes >= 1
    total = sum(x[2] for x in r)
    # covered area strictly between the raw polygon and its bbox buffer
    assert 0.186 < total < (0.7 * 0.5)


def test_shrink_keeps_convex_exact_path():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    r = buffer_polygon_mitre(sq, -0.1)
    assert len(r) == 1
    assert abs(r[0][2] - 0.64) < 1e-12


def test_shrink_concave_is_an_explicit_limitation():
    """Negative distances route through the exact convex kernel; a
    concave ring raises rather than silently mis-buffering (erosion of
    concave polygons is JTS territory, documented out of scope)."""
    import pytest

    L = np.array([[0, 0], [0.6, 0], [0.6, 0.2], [0.3, 0.2], [0.3, 0.4], [0, 0.4]])
    with pytest.raises(ValueError):
        buffer_polygon_mitre(L, -0.05)
