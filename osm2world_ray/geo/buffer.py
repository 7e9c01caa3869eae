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


def buffer_polygon_mitre(ring: np.ndarray, distance: float,
                         mitre_limit: float = 5.0):
    """General (possibly concave) OUTWARD mitre-join polygon buffer —
    the full ``JTSBufferUtil.bufferPolygon`` analogue (JTS ``BufferOp``
    with ``JOIN_MITRE`` and the default mitre limit 5,
    ``JTSBufferUtil.java:19-32``).

    Construction: the buffered region is the union of the polygon, one
    outward offset rectangle per edge and one mitre wedge per convex
    vertex (intersection point of the two offset edge lines; beveled
    when the mitre ratio exceeds ``mitre_limit``, JTS's spike
    truncation). The union is dissolved exactly through the segment
    arrangement machinery (``geo/faces``): keep arrangement cells whose
    interior point lies in any piece, take edges used by exactly one
    kept cell as the union boundary, and re-walk that boundary into
    outer rings + holes — so bay-closing buffers produce real holes.

    Returns a list of (outer_ring, hole_rings, area) with CCW outers.
    Negative distances keep the exact convex path
    (:func:`buffer_convex_ring`).
    """
    from .faces import (_interior_point, _noded_edges, _point_in_loop,
                        _signed_area, faces_from_edges, ring_segments)

    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    if distance <= 0 or is_convex(pts):
        # exact closed form: the mitre buffer of a convex ring is the
        # re-intersection of its offset edge lines (no arrangement work)
        out = buffer_convex_ring(pts, distance)
        return [(
            [tuple(p) for p in out],
            [],
            abs(_signed_area([tuple(p) for p in out])),
        )]
    if _signed_area2(pts) < 0:
        pts = pts[::-1]  # CCW
    n = len(pts)
    d = float(distance)
    pieces: list[list[tuple]] = [[tuple(p) for p in pts]]
    # outward normals (right of each CCW edge direction)
    nx, ny = [], []
    for i in range(n):
        ex = pts[(i + 1) % n, 0] - pts[i, 0]
        ey = pts[(i + 1) % n, 1] - pts[i, 1]
        ln = float(np.hypot(ex, ey))
        nx.append(ey / ln)
        ny.append(-ex / ln)
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        pieces.append([
            (a[0], a[1]), (b[0], b[1]),
            (b[0] + nx[i] * d, b[1] + ny[i] * d),
            (a[0] + nx[i] * d, a[1] + ny[i] * d),
        ])
    for i in range(n):  # wedge at vertex i between edges i-1 and i
        p_prev = i - 1
        v = pts[i]
        e1x, e1y = pts[i, 0] - pts[p_prev, 0], pts[i, 1] - pts[p_prev, 1]
        e2x, e2y = pts[(i + 1) % n, 0] - pts[i, 0], pts[(i + 1) % n, 1] - pts[i, 1]
        turn = e1x * e2y - e1y * e2x
        if turn <= 0:
            continue  # reflex/straight: offset rects already overlap
        q1 = (v[0] + nx[p_prev] * d, v[1] + ny[p_prev] * d)
        q2 = (v[0] + nx[i] * d, v[1] + ny[i] * d)
        # mitre point: intersection of the two offset edge lines
        det = e1x * e2y - e1y * e2x
        wx = q2[0] - q1[0]
        wy = q2[1] - q1[1]
        t = (wx * e2y - wy * e2x) / det
        m = (q1[0] + t * e1x, q1[1] + t * e1y)
        ratio = float(np.hypot(m[0] - v[0], m[1] - v[1])) / d
        if ratio > mitre_limit:
            pieces.append([(v[0], v[1]), q1, q2])  # bevel (spike capped)
        else:
            pieces.append([(v[0], v[1]), q1, m, q2])
    # arrangement of all piece edges
    segments = []
    for p in pieces:
        segments.extend(ring_segments(np.asarray(p)))
    ccw, _cw = faces_from_edges(_noded_edges(segments))
    kept = []
    for loop in ccw:
        px, py = _interior_point(loop)
        if any(_point_in_loop(px, py, p) for p in pieces):
            kept.append(loop)
    # union boundary = undirected edges used by exactly one kept cell
    from collections import Counter
    cnt = Counter()
    for loop in kept:
        for a, b in zip(loop, loop[1:] + loop[:1]):
            cnt[(min(a, b), max(a, b))] += 1
    boundary = {e for e, c in cnt.items() if c == 1}
    outers, holes = faces_from_edges(boundary)
    # a closed uncovered pocket contributes BOTH orientations of its
    # ring to the boundary walk; keep only covered CCW loops as outers
    # (the pocket's CW twin then fits as a hole below)
    covered = []
    for o in outers:
        px, py = _interior_point(o)
        if any(_point_in_loop(px, py, p) for p in pieces):
            covered.append(o)
    result = [{"outer": o, "holes": []} for o in covered]
    for h in holes:
        probe = _interior_point(h)
        h_area = abs(_signed_area(h))
        best, best_area = None, np.inf
        for r in result:
            ar = _signed_area(r["outer"])
            if ar <= h_area + 1e-12:
                continue
            if _point_in_loop(probe[0], probe[1], r["outer"]) and ar < best_area:
                best, best_area = r, ar
        if best is not None:
            best["holes"].append(h)
    return [
        (
            r["outer"],
            r["holes"],
            _signed_area(r["outer"]) - sum(abs(_signed_area(h)) for h in r["holes"]),
        )
        for r in result
    ]
