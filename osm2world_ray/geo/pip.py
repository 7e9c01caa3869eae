"""Point-in-polygon: vectorized even-odd ray cast, holes honored.

Semantics follow the reference's ray-cast ``contains``
(``core/src/main/java/org/osm2world/math/shapes/SimplePolygonShapeXZ.java:74-91``)
and the with-holes rule (``PolygonShapeXZ.java:58-68``): a point is
inside a polygon-with-holes iff it is inside the outer ring and inside
no hole ring. We use the standard half-open crossing rule
(``(y1 > py) != (y2 > py)``) so points exactly on a horizontal edge are
classified deterministically and tiles/polygons sharing an edge never
double-claim a point.

The kernel is (n_points x n_edges) vectorized numpy; for many polygons
use :mod:`osm2world_ray.geo.gridindex` to cut the candidate set first.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast of points against one closed ring.

    ``ring`` is an (n, 2) float64 array; the closing edge last->first is
    implied (a duplicated closing vertex is tolerated — its degenerate
    edge never crosses). Returns a boolean mask.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    # broadcast points (m,1) against edges (1,n)
    pyc = py[:, None]
    pxc = px[:, None]
    crosses = (y1[None, :] > pyc) != (y2[None, :] > pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (pyc - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
    hits = crosses & (pxc < xint)
    return (hits.sum(axis=1) % 2).astype(bool)


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, outer: np.ndarray, holes: list[np.ndarray] | None = None
) -> np.ndarray:
    """Points inside outer ring and inside no hole (PolygonShapeXZ.java:58-68)."""
    inside = points_in_ring(px, py, outer)
    if holes:
        for h in holes:
            inside &= ~points_in_ring(px, py, h)
    return inside


def ring_bbox(outer: np.ndarray) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of a ring."""
    outer = np.asarray(outer, dtype=np.float64)
    return (
        float(outer[:, 0].min()),
        float(outer[:, 1].min()),
        float(outer[:, 0].max()),
        float(outer[:, 1].max()),
    )


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = counterclockwise)."""
    ring = np.asarray(ring, dtype=np.float64)
    x = ring[:, 0]
    y = ring[:, 1]
    x2 = np.roll(x, -1)
    y2 = np.roll(y, -1)
    return float(0.5 * np.sum(x * y2 - x2 * y))


def close_ring(ring: np.ndarray) -> np.ndarray:
    """Append the first vertex if the ring is not closed
    (GeometryUtil.closeLoop, ``GeometryUtil.java:40-46``)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) == 0 or np.array_equal(ring[0], ring[-1]):
        return ring
    return np.vstack([ring, ring[:1]])


def drop_consecutive_duplicates(ring: np.ndarray) -> np.ndarray:
    """Remove consecutive duplicate vertices
    (MapDataCreationUtil.withoutConsecutiveDuplicates, used
    ``MapArea.java:53-55``)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 2:
        return ring
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = np.any(ring[1:] != ring[:-1], axis=1)
    return ring[keep]
