"""Face decomposition + CAG subtract on the segment arrangement graph.

Reference semantics (``FaceDecompositionUtil.java:32-220``,
``CAGUtil.java:37-41``): ``subtractPolygons(base, subs)`` =
``splitPolygonIntoFaces``:

1. collect the segments of every ring (base + subtract polygons),
2. find all pairwise segment intersections; snap intersection points
   within ``SNAP_DISTANCE`` (1e-5) to existing endpoints (:75-100),
3. split every segment at its intersection points, ordered by distance
   from the lexicographically smaller endpoint; deduplicate undirected
   edges (:102-120),
4. walk faces in the fully-noded graph: at each node the outgoing
   edges are angle-sorted; the face continues with the edge one step
   past the reversed incoming edge — interior faces come out CCW, the
   infinite face (and hole boundaries) CW (:135-212),
5. fit CW rings into CCW faces as holes, then keep only faces whose
   interior point lies inside the base polygon and not inside any
   subtract polygon (:45-71).

Pure python/numpy kernel on small per-geometry inputs (the arrangement
of ONE base polygon with its subtract set — bounded work per element;
the distributed axis is elements via map_batches, not this graph).
"""

from __future__ import annotations

import math

import numpy as np

SNAP_DISTANCE = 1e-5
_EPS = 1e-12


def ring_segments(ring: np.ndarray):
    """(n,2) open ring -> list of endpoint pairs ((x,y),(x,y))."""
    out = []
    n = len(ring)
    for i in range(n):
        a = (float(ring[i][0]), float(ring[i][1]))
        b = (float(ring[(i + 1) % n][0]), float(ring[(i + 1) % n][1]))
        if a != b:
            out.append((a, b))
    return out


def _seg_intersections(segments):
    """All pairwise intersection points: {seg_index: [points]}."""
    n = len(segments)
    if n == 0:
        return {}
    a = np.array([s[0] for s in segments])
    b = np.array([s[1] for s in segments])
    d = b - a
    pts: dict[int, list[tuple[float, float]]] = {i: [] for i in range(n)}
    # vectorized over all pairs (i<j): solve a_i + t*d_i = a_j + u*d_j
    ii, jj = np.triu_indices(n, k=1)
    det = d[ii, 0] * d[jj, 1] - d[ii, 1] * d[jj, 0]
    ok = np.abs(det) > _EPS
    ii, jj, det = ii[ok], jj[ok], det[ok]
    w = a[jj] - a[ii]
    t = (w[:, 0] * d[jj, 1] - w[:, 1] * d[jj, 0]) / det
    u = (w[:, 0] * d[ii, 1] - w[:, 1] * d[ii, 0]) / det
    hit = (t >= -_EPS) & (t <= 1 + _EPS) & (u >= -_EPS) & (u <= 1 + _EPS)
    for i, j, tt in zip(ii[hit], jj[hit], t[hit]):
        p = (float(a[i, 0] + tt * d[i, 0]), float(a[i, 1] + tt * d[i, 1]))
        pts[int(i)].append(p)
        pts[int(j)].append(p)
    return pts


def _noded_edges(segments):
    """Segments + intersections -> duplicate-free undirected edge set."""
    inter = _seg_intersections(segments)
    known = set()
    for s in segments:
        known.add(s[0])
        known.add(s[1])
    known_arr = np.array(sorted(known))
    edges = set()
    for i, (p1, p2) in enumerate(segments):
        points = {p1, p2}
        for p in inter.get(i, ()):  # snap to nearby endpoints (:88-100)
            dd = np.hypot(known_arr[:, 0] - p[0], known_arr[:, 1] - p[1])
            k = int(np.argmin(dd))
            if dd[k] < SNAP_DISTANCE:
                p = (float(known_arr[k, 0]), float(known_arr[k, 1]))
            points.add(p)
        start = min((p1, p2))
        ordered = sorted(
            points, key=lambda q: (q[0] - start[0]) ** 2 + (q[1] - start[1]) ** 2
        )
        for q1, q2 in zip(ordered, ordered[1:]):
            if q1 != q2:
                edges.add((min(q1, q2), max(q1, q2)))
    return edges


def _signed_area(loop) -> float:
    x0, y0 = loop[0]
    s = 0.0
    for (x1, y1), (x2, y2) in zip(loop, loop[1:] + loop[:1]):
        s += (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    return 0.5 * s


def faces_from_edges(edges):
    """Fully-noded undirected edges -> (ccw_faces, cw_faces) vertex
    loops (FaceDecompositionUtil.java:136-212)."""
    directed = set()
    out_at: dict[tuple, list] = {}
    for p, q in edges:
        directed.add((p, q))
        directed.add((q, p))
        out_at.setdefault(p, []).append(q)
        out_at.setdefault(q, []).append(p)
    for p, qs in out_at.items():
        qs.sort(key=lambda q: math.atan2(q[1] - p[1], q[0] - p[0]))
    remaining = set(directed)
    ccw, cw = [], []
    while remaining:
        first = next(iter(remaining))
        path = [first]
        while True:
            cur = path[-1]
            outs = out_at[cur[1]]
            # one step CLOCKWISE past the reversed incoming edge, so
            # interior faces trace counterclockwise (with atan2-ascending
            # outgoing order this is index -1; the reference's +1 pairs
            # with its clockwise-from-Z angle sort, :168-190)
            k = outs.index(cur[0])
            nxt = (cur[1], outs[(k - 1) % len(outs)])
            if nxt == path[0]:
                break
            path.append(nxt)
            if len(path) > 10000:  # reference's runaway guard (:195)
                break
        remaining.difference_update(path)
        loop = [e[0] for e in path]
        if len(loop) < 3:
            continue
        area = _signed_area(loop)
        if abs(area) < _EPS:
            continue
        (ccw if area > 0 else cw).append(loop)
    return ccw, cw


def _point_in_loop(px, py, loop) -> bool:
    x = np.array([p[0] for p in loop])
    y = np.array([p[1] for p in loop])
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cond = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x + (py - y) / (y2 - y) * (x2 - x)
    return bool(np.count_nonzero(cond & (px < xint)) % 2)


def _interior_point(loop):
    """A point strictly inside a simple loop (first valid ear
    centroid)."""
    n = len(loop)
    ccw = _signed_area(loop) > 0
    for k in range(n):
        a, b, c = loop[(k - 1) % n], loop[k], loop[(k + 1) % n]
        cr = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if (cr > _EPS) != ccw or abs(cr) < _EPS:
            continue
        px = (a[0] + b[0] + c[0]) / 3.0
        py = (a[1] + b[1] + c[1]) / 3.0
        if _point_in_loop(px, py, loop):
            return px, py
    return loop[0]


def _in_polygon_with_holes(px, py, outer, holes) -> bool:
    if not _point_in_loop(px, py, outer):
        return False
    return not any(_point_in_loop(px, py, h) for h in holes)


def split_polygon_into_faces(base_outer: np.ndarray,
                             base_holes: list[np.ndarray],
                             subtract: list[list[np.ndarray]]):
    """CAG subtract via face decomposition.

    ``subtract`` is a list of polygons, each a list of rings (outer
    first). Returns a list of faces: (outer_loop, hole_loops, area).
    """
    segments = list(ring_segments(base_outer))
    for h in base_holes:
        segments.extend(ring_segments(h))
    sub_rings = []
    for poly in subtract:
        for r in poly:
            segments.extend(ring_segments(r))
        sub_rings.append([np.asarray(r) for r in poly])
    edges = _noded_edges(segments)
    ccw, cw = faces_from_edges(edges)
    # fit CW rings into the smallest enclosing CCW face; a component's
    # infinite face shares its vertex set with a CCW twin -> excluded
    faces = [{"outer": f, "holes": []} for f in ccw]
    for ring in cw:
        probe = _interior_point(ring)
        r_area = abs(_signed_area(ring))
        best, best_area = None, np.inf
        for f in faces:
            ar = _signed_area(f["outer"])
            # strict area ordering excludes each component's infinite
            # face (same region as its CCW twin / a larger region than
            # any interior face it touches)
            if ar <= r_area + _EPS:
                continue
            if _point_in_loop(probe[0], probe[1], f["outer"]) and ar < best_area:
                best, best_area = f, ar
        if best is not None:
            best["holes"].append(ring)
    # keep faces inside the base polygon (:45-46), drop faces whose
    # interior point lies inside a subtract polygon (:52-71)
    out = []
    for f in faces:
        px, py = _face_probe(f)
        if not _in_polygon_with_holes(px, py, [tuple(p) for p in map(tuple, base_outer)],
                                      [[tuple(q) for q in map(tuple, h)] for h in base_holes]):
            continue
        in_sub = False
        for poly in sub_rings:
            outer_l = [tuple(p) for p in poly[0]]
            hole_ls = [[tuple(p) for p in r] for r in poly[1:]]
            if _in_polygon_with_holes(px, py, outer_l, hole_ls):
                in_sub = True
                break
        if in_sub:
            continue
        area = _signed_area(f["outer"]) - sum(abs(_signed_area(h)) for h in f["holes"])
        out.append((f["outer"], f["holes"], area))
    return out


def _face_probe(f):
    """Interior point of a face avoiding its holes — the JTS
    interiorPoint scanline: crossings of a horizontal bisector with all
    rings alternate inside/outside (even-odd); take the midpoint of the
    widest inside interval. Retries nearby scanlines that graze a
    vertex."""
    outer = f["outer"]
    ys = [p[1] for p in outer]
    y0, y1 = min(ys), max(ys)
    rings = [outer] + f["holes"]
    for frac in (0.5, 0.37, 0.61, 0.43, 0.57, 0.29, 0.71):
        py = y0 + (y1 - y0) * frac
        if any(abs(p[1] - py) < _EPS for r in rings for p in r):
            continue  # grazes a vertex; ambiguous crossings
        xs = []
        for r in rings:
            for (ax, ay), (bx, by) in zip(r, r[1:] + r[:1]):
                if (ay > py) != (by > py):
                    xs.append(ax + (py - ay) / (by - ay) * (bx - ax))
        xs.sort()
        best, best_w = None, 0.0
        for k in range(0, len(xs) - 1, 2):
            w = xs[k + 1] - xs[k]
            if w > best_w:
                best, best_w = (xs[k] + xs[k + 1]) / 2.0, w
        if best is not None and best_w > _EPS:
            return best, py
    return outer[0]
