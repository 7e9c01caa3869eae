"""Polygon buffer (grow/shrink), mitre joins — JTSBufferUtil analogue.

The reference buffers polygons with JTS ``BufferOp`` configured for
MITRE joins (``JTSBufferUtil.java:19-32``). For a CONVEX ring the
mitre-join buffer is exact and closed-form: offset every edge line
outward by ``distance`` along its normal and re-intersect consecutive
edge lines — each vertex becomes the mitre corner of its two offset
edges. Shrinking (negative distance) uses the same construction while
the result stays simple. Concave rings would need arc/mitre-limit
handling and self-intersection cleanup (JTS territory) — out of scope,
guarded by a convexity check.
"""

from __future__ import annotations

import numpy as np


def _signed_area2(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def is_convex(ring: np.ndarray) -> bool:
    """True for a convex simple ring (either winding)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    c = np.roll(ring, -2, axis=0)
    cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - b[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - b[:, 0])
    return bool((cross >= 0).all() or (cross <= 0).all())


def buffer_convex_ring(ring: np.ndarray, distance: float) -> np.ndarray:
    """Mitre-join buffer of a convex ring by ``distance`` (outward
    positive, inward negative). Returns the buffered ring CCW; raises
    ValueError on non-convex input or an inward distance that
    collapses the ring."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError("ring needs >= 3 vertices")
    if not is_convex(pts):
        raise ValueError("buffer_convex_ring requires a convex ring")
    if _signed_area2(pts) < 0:
        pts = pts[::-1]  # normalize CCW

    a = pts
    b = np.roll(pts, -1, axis=0)
    ex = b[:, 0] - a[:, 0]
    ey = b[:, 1] - a[:, 1]
    length = np.hypot(ex, ey)
    if (length == 0).any():
        raise ValueError("degenerate zero-length edge")
    # outward normal of a CCW edge is (ey, -ex)/len
    nx = ey / length
    ny = -ex / length
    # offset edge line through (a + d*n) with direction (ex, ey);
    # vertex i of the result = intersection of offset edges i-1 and i
    ox = a[:, 0] + distance * nx
    oy = a[:, 1] + distance * ny
    out = np.empty_like(pts)
    n = len(pts)
    for i in range(n):
        j = (i - 1) % n
        # solve o_j + t*e_j == o_i + s*e_i
        denom = ex[j] * ey[i] - ey[j] * ex[i]
        if denom == 0:  # collinear adjacent edges: keep the offset point
            out[i] = (ox[i], oy[i])
            continue
        t = ((ox[i] - ox[j]) * ey[i] - (oy[i] - oy[j]) * ex[i]) / denom
        out[i] = (ox[j] + t * ex[j], oy[j] + t * ey[j])
    # a too-large inward distance flips edges through themselves (the
    # output can still be a valid-looking polygon for symmetric
    # shapes): every output edge must keep its source edge's direction
    nxt = np.roll(out, -1, axis=0)
    dots = (nxt[:, 0] - out[:, 0]) * ex + (nxt[:, 1] - out[:, 1]) * ey
    if (dots <= 0).any() or _signed_area2(out) <= 0:
        raise ValueError("inward distance collapsed the ring")
    return out
