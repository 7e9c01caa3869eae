"""Polygon buffer (grow/shrink), mitre joins — JTSBufferUtil analogue.

The reference buffers polygons with JTS ``BufferOp`` configured for
MITRE joins (``JTSBufferUtil.java:19-32``). For a CONVEX ring the
mitre-join buffer is exact and closed-form: offset every edge line
outward by ``distance`` along its normal and re-intersect consecutive
edge lines — each vertex becomes the mitre corner of its two offset
edges. Shrinking (negative distance) uses the same construction while
the result stays simple. Concave rings route through the arrangement
machinery: outward growth dissolves the union of offset pieces
(:func:`buffer_polygon_mitre`), inward shrink keeps the
positive-winding cells of the noded raw offset curve
(:func:`shrink_polygon_mitre`) — the same offset-curve method JTS's
``BufferOp`` uses, restricted to mitre/bevel joins.
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
    if distance <= 0 and not is_convex(pts):
        # concave shrink: raw inward offset curve + winding selection
        # (d == 0 included — buffer_convex_ring refuses concave input,
        # shrink_polygon_mitre(pts, 0) returns the ring unchanged)
        return shrink_polygon_mitre(pts, distance, mitre_limit)
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

    def keep(px, py):
        return any(_point_in_loop(px, py, p) for p in pieces)

    return _dissolve_faces(segments, keep)


def _dissolve_faces(segments, keep):
    """Arrangement of ``segments`` -> dissolved region of the faces
    selected by ``keep(px, py)``: union boundary = undirected edges
    used by exactly one kept cell, re-walked into outer rings + holes.
    Returns a list of (outer_ring, hole_rings, area) with CCW outers.
    """
    from collections import Counter

    from .faces import (_interior_point, _noded_edges, _point_in_loop,
                        _signed_area, faces_from_edges)

    ccw, _cw = faces_from_edges(_noded_edges(segments))
    kept = []
    for loop in ccw:
        px, py = _interior_point(loop)
        if keep(px, py):
            kept.append(loop)
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
        if keep(px, py):
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


def _winding(qx: float, qy: float, curve) -> int:
    """Winding number of (qx, qy) around a closed directed polyline
    given as directed segments (signed horizontal-ray crossings)."""
    w = 0
    for (x1, y1), (x2, y2) in curve:
        cross = (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
        if y1 <= qy < y2:
            if cross > 0:
                w += 1
        elif y2 <= qy < y1:
            if cross < 0:
                w -= 1
    return w


def shrink_polygon_mitre(ring: np.ndarray, distance: float,
                         mitre_limit: float = 5.0):
    """General (possibly CONCAVE) INWARD mitre-join polygon buffer —
    the negative-distance half of ``JTSBufferUtil.bufferPolygon``
    (JTS ``BufferOp`` with ``JOIN_MITRE``, ``JTSBufferUtil.java:19-32``)
    that :func:`buffer_convex_ring` refuses for concave rings.

    Construction (the raw-offset-curve method JTS itself uses): offset
    every edge inward by ``|distance|`` along its normal; join
    consecutive offset edges at each vertex through the mitre point
    (the intersection of the two offset edge lines) when the mitre
    ratio stays within ``mitre_limit``, else bevel with a direct
    connection. The resulting closed directed curve may self-intersect
    — node it through the segment-arrangement machinery (``geo/faces``)
    and keep the cells whose winding number w.r.t. the directed curve
    is positive; their dissolved union is the shrunk polygon. A
    distance past the collapse point yields no positive-winding cells
    and returns [] (an empty geometry, like JTS) instead of raising.

    Returns a list of (outer_ring, hole_rings, area) with CCW outers —
    a concave shrink can split one ring into several.
    """
    from .faces import ring_segments

    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    if len(pts) < 3:
        raise ValueError("ring needs >= 3 vertices")
    if _signed_area2(pts) < 0:
        pts = pts[::-1]  # normalize CCW
    d = abs(float(distance))
    if d == 0:
        return [(
            [tuple(p) for p in pts], [], abs(_signed_area2(pts)) / 2.0,
        )]
    n = len(pts)
    a = pts
    b = np.roll(pts, -1, axis=0)
    ex = b[:, 0] - a[:, 0]
    ey = b[:, 1] - a[:, 1]
    length = np.hypot(ex, ey)
    if (length == 0).any():
        raise ValueError("degenerate zero-length edge")
    # inward normal of a CCW edge is (-ey, ex)/len
    inx = -ey / length
    iny = ex / length
    oax = a[:, 0] + d * inx
    oay = a[:, 1] + d * iny
    obx = b[:, 0] + d * inx
    oby = b[:, 1] + d * iny
    curve: list[tuple[tuple[float, float], tuple[float, float]]] = []
    for i in range(n):
        k = (i + 1) % n  # next edge, joined at vertex b_i == a_k
        curve.append(((oax[i], oay[i]), (obx[i], oby[i])))
        p_end = (obx[i], oby[i])
        p_start = (oax[k], oay[k])
        if p_end == p_start:
            continue
        denom = ex[i] * ey[k] - ey[i] * ex[k]
        if denom != 0:
            # mitre point: intersection of the two offset edge lines
            t = (
                (oax[k] - oax[i]) * ey[k] - (oay[k] - oay[i]) * ex[k]
            ) / denom
            mx = oax[i] + t * ex[i]
            my = oay[i] + t * ey[i]
            v = b[i]
            if np.hypot(mx - v[0], my - v[1]) / d <= mitre_limit:
                curve.append((p_end, (mx, my)))
                curve.append(((mx, my), p_start))
                continue
        curve.append((p_end, p_start))  # parallel or past the limit: bevel
    segments = [s for s in curve if s[0] != s[1]]
    # also node against themselves via the arrangement; face selection
    # by the DIRECTED curve's winding number
    return _dissolve_faces(
        segments, lambda px, py: _winding(px, py, segments) > 0
    )


# re-exported for callers that dispatch on sign/convexity
def buffer_any_ring(ring: np.ndarray, distance: float,
                    mitre_limit: float = 5.0):
    """Sign/shape dispatch: exact convex closed form where it applies,
    arrangement-backed general paths otherwise."""
    pts = np.asarray(ring, dtype=np.float64)
    p = pts[:-1] if len(pts) and np.array_equal(pts[0], pts[-1]) else pts
    if distance >= 0:
        return buffer_polygon_mitre(ring, distance, mitre_limit)
    if is_convex(p):
        out = buffer_convex_ring(p, distance)
        from .faces import _signed_area

        loop = [tuple(q) for q in out]
        return [(loop, [], abs(_signed_area(loop)))]
    return shrink_polygon_mitre(ring, distance, mitre_limit)
