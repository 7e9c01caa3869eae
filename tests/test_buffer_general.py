"""General mitre polygon buffer (JTSBufferUtil / JTS JOIN_MITRE)."""

import numpy as np

from osm2world_ray.geo.buffer import buffer_polygon_mitre


def _strip_collinear(loop):
    """Noding can leave collinear pass-through vertices on the
    dissolved boundary; geometry is unchanged."""
    out = []
    n = len(loop)
    for i in range(n):
        ax, ay = loop[i - 1]
        bx, by = loop[i]
        cx, cy = loop[(i + 1) % n]
        if abs((bx - ax) * (cy - by) - (by - ay) * (cx - bx)) > 1e-12:
            out.append(loop[i])
    return out


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


def test_shrink_concave_L_closed_form():
    """Inward mitre shrink of an axis-aligned L: every edge insets by d
    (perpendicular mitres = axis-aligned corners, the reflex corner
    insets INTO the notch), so the result is the closed-form inset L."""
    L = np.array([[0, 0], [0.6, 0], [0.6, 0.2], [0.3, 0.2], [0.3, 0.4], [0, 0.4]])
    d = 0.05
    r = buffer_polygon_mitre(L, -d)
    assert len(r) == 1 and len(r[0][1]) == 0
    expect = {
        (d, d), (0.55, d), (0.55, 0.15), (0.25, 0.15), (0.25, 0.35),
        (d, 0.35),
    }
    got = {(round(x, 12), round(y, 12)) for x, y in _strip_collinear(r[0][0])}
    assert got == expect
    # area of the inset L: 0.5x0.1 lower leg + 0.2x0.2 upper leg
    assert abs(r[0][2] - 0.09) < 1e-9


def test_shrink_concave_matches_convex_on_square_and_agrees():
    """The winding-selection shrink agrees with the exact convex kernel
    where both apply."""
    from osm2world_ray.geo.buffer import shrink_polygon_mitre

    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    r = shrink_polygon_mitre(sq, -0.1)
    assert len(r) == 1 and abs(r[0][2] - 0.64) < 1e-9


def test_shrink_splits_dumbbell():
    """A dumbbell (two chambers joined by a thin neck) erodes into two
    separate polygons once d exceeds half the neck width."""
    D = np.array(
        [[0, 0], [0.4, 0], [0.4, 0.15], [0.6, 0.15], [0.6, 0], [1.0, 0],
         [1.0, 0.4], [0.6, 0.4], [0.6, 0.25], [0.4, 0.25], [0.4, 0.4], [0, 0.4]]
    )
    r = buffer_polygon_mitre(D, -0.06)
    assert len(r) == 2
    for outer, holes, area in r:
        assert not holes
        assert abs(area - (0.4 - 0.12) * (0.4 - 0.12)) < 1e-9


def test_shrink_past_collapse_returns_empty():
    L = np.array([[0, 0], [0.6, 0], [0.6, 0.2], [0.3, 0.2], [0.3, 0.4], [0, 0.4]])
    assert buffer_polygon_mitre(L, -0.2) == []
