"""Roof-shape geometry kernels (BuildingModule roof family).

Reference semantics: ``world/modules/building/roof/Roof.java`` (shape
dispatch ``createRoofForShape``, ``snapDirection``, ``parseRoofAngle``),
``RoofWithRidge.java:71-145`` (ridge construction for tag-described
shapes), ``AbstractGabledRoof.java`` / ``AbstractHippedRoof.java``
(height fields + inner lines), ``SkillionRoof.java:33-116``,
``PyramidalRoof.java``, ``FlatRoof.java``,
``math/shapes/SimplePolygonShapeXZ.java:162-172`` (polygon diameter =
max pairwise vertex distance) and ``:193-237``
(minimum-area rotated bounding box with per-edge candidates).

Coordinate convention: x = east, y = north. An OSM angle of ``d``
degrees from north maps to the unit vector ``(sin(rad), cos(rad))``
(``VectorXZ.fromAngle`` with y taking the role of z), a vector's angle
is ``atan2(x, y) mod 2*pi`` (``VectorXZ.angle``), and
``right_normal((x, y)) == (y, -x)`` (``VectorXZ.rightNormal``).
Distances use the ``sqrt(dx*dx + dy*dy)`` expression shape (what Java
``VectorXZ.length`` compiles to), never ``np.hypot`` — the SQL oracles
mirror the same shape.

Pure numpy + math; no Ray imports.
"""

from __future__ import annotations

import math

import numpy as np

from ..functions.parsers import parse_angle, parse_measure, parse_osm_decimal

TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------------------
# primitive helpers
# ---------------------------------------------------------------------------

def drop_closing(ring: np.ndarray) -> np.ndarray:
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) > 1 and pts[0][0] == pts[-1][0] and pts[0][1] == pts[-1][1]:
        pts = pts[:-1]
    return pts


def signed_area2(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def area_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Polygon area centroid (``SimplePolygonXZ.getCentroid``)."""
    x, y = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y1 - x1 * y
    a2 = float(cross.sum())
    cx = float(((x + x1) * cross).sum()) / (3.0 * a2)
    cy = float(((y + y1) * cross).sum()) / (3.0 * a2)
    return cx, cy


def simplify_ring(ring: np.ndarray) -> np.ndarray:
    """Drop vertices collinear with both neighbours
    (``SimplePolygonXZ.getSimplifiedPolygon``). Keeps at least a
    triangle; returns the input when everything is collinear."""
    pts = drop_closing(ring)
    n = len(pts)
    if n < 4:
        return pts
    prev = np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0)
    cross = (pts[:, 0] - prev[:, 0]) * (nxt[:, 1] - prev[:, 1]) - (
        pts[:, 1] - prev[:, 1]
    ) * (nxt[:, 0] - prev[:, 0])
    keep = cross != 0.0
    if keep.sum() < 3:
        return pts
    return pts[keep]


def dist_point_line(px, py, ax, ay, bx, by) -> float:
    """Distance from point to the infinite line through a-b
    (``GeometryUtil.distanceFromLine``)."""
    ex, ey = bx - ax, by - ay
    ln = math.sqrt(ex * ex + ey * ey)
    return abs(ex * (py - ay) - ey * (px - ax)) / ln


def dist_point_seg(px, py, ax, ay, bx, by) -> float:
    """Distance from point to the segment a-b
    (``GeometryUtil.distanceFromLineSegment``)."""
    ex, ey = bx - ax, by - ay
    ll = ex * ex + ey * ey
    if ll == 0.0:
        dx, dy = px - ax, py - ay
        return math.sqrt(dx * dx + dy * dy)
    t = ((px - ax) * ex + (py - ay) * ey) / ll
    t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
    qx, qy = ax + t * ex, ay + t * ey
    dx, dy = px - qx, py - qy
    return math.sqrt(dx * dx + dy * dy)


def is_right_of(px, py, ax, ay, bx, by) -> bool:
    """p strictly right of the directed line a->b (x east / y north);
    mirrors ``GeometryUtil.isRightOf`` with y as z."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax) < 0.0


def angle_of(dx: float, dy: float) -> float:
    """``VectorXZ.angle``: clockwise-from-north in [0, 2*pi)."""
    return math.atan2(dx, dy) % TWO_PI


def from_angle(rad: float) -> tuple[float, float]:
    return math.sin(rad), math.cos(rad)


def right_normal(dx: float, dy: float) -> tuple[float, float]:
    return dy, -dx


def radians_between(a: float, b: float) -> float:
    d = (a - b) % TWO_PI
    return min(d, TWO_PI - d)


def polygon_diameter(ring: np.ndarray) -> float:
    """Max pairwise vertex distance
    (``SimplePolygonShapeXZ.getDiameter``)."""
    dx = ring[:, 0][:, None] - ring[:, 0][None, :]
    dy = ring[:, 1][:, None] - ring[:, 1][None, :]
    return float(np.sqrt(dx * dx + dy * dy).max())


def min_obb_longest_dir(ring: np.ndarray) -> tuple[float, float]:
    """Unit direction of the LONGEST side of the minimum-area rotated
    bounding box (``SimplePolygonShapeXZ.minimumRotatedBoundingBox``:
    candidate boxes are per polygon edge; ``RoofWithRidge.
    ridgeVectorFromRoofOrientation`` then takes the longest box side).
    First edge wins area ties, matching the Java ``<`` update."""
    pts = drop_closing(ring)
    a = pts
    b = np.roll(pts, -1, axis=0)
    best = None
    for i in range(len(pts)):
        ex, ey = b[i, 0] - a[i, 0], b[i, 1] - a[i, 1]
        ln = math.sqrt(ex * ex + ey * ey)
        if ln == 0.0:
            continue
        ux, uy = ex / ln, ey / ln
        s = pts[:, 0] * ux + pts[:, 1] * uy
        t = -pts[:, 0] * uy + pts[:, 1] * ux
        ds = float(s.max() - s.min())
        dt = float(t.max() - t.min())
        area = ds * dt
        if best is None or area < best[0]:
            best = (area, ds, dt, ux, uy)
    _, ds, dt, ux, uy = best
    if ds >= dt:
        return ux, uy
    return -uy, ux


# ---------------------------------------------------------------------------
# tag parsing (Roof.java helpers)
# ---------------------------------------------------------------------------

def snap_direction(value: str | None, ring: np.ndarray) -> float | None:
    """``Roof.snapDirection``: parse an OSM direction tag and snap it to
    the nearest angle parallel/orthogonal to a polygon segment when the
    required correction is small enough for the tag's precision class.
    Returns radians or None."""
    if value is None:
        return None
    deg = parse_angle(value)
    if deg is None:
        return None
    ang = math.radians(deg)
    pts = drop_closing(ring)
    b = np.roll(pts, -1, axis=0)
    cand: list[float] = []
    for i in range(len(pts)):
        seg_ang = angle_of(b[i, 0] - pts[i, 0], b[i, 1] - pts[i, 1])
        for k in range(4):
            cand.append((seg_ang + k * 0.5 * math.pi) % TWO_PI)
    closest = min(cand, key=lambda c: radians_between(c, ang))
    if all(ch in "NSEW" for ch in value) and value != "":
        acceptable = math.pi / 4
    elif "." not in value:
        acceptable = math.pi / 18
    else:
        acceptable = math.pi / 360
    if radians_between(closest, ang) <= acceptable:
        return closest
    return ang


def parse_roof_angle(tags: dict) -> float | None:
    """``Roof.parseRoofAngle``: roof:angle in [0, 90) degrees -> radians."""
    v = parse_osm_decimal(tags.get("roof:angle"))
    if v is not None and 0.0 <= v < 90.0:
        return math.radians(v)
    return None


# ---------------------------------------------------------------------------
# ridge construction (RoofWithRidge.java:71-145)
# ---------------------------------------------------------------------------

class RoofGeometryError(ValueError):
    pass


def _line_polygon_hits(ring: np.ndarray, ox, oy, dx, dy):
    """Intersections of the parametric line (o + t*d, t in [0, inf)) with
    the ring's segments; returns a list of (t, x, y, seg_len)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    hits = []
    for i in range(len(ring)):
        ax, ay, bx, by = a[i, 0], a[i, 1], b[i, 0], b[i, 1]
        ex, ey = bx - ax, by - ay
        den = dx * ey - dy * ex
        if den == 0.0:
            continue
        # solve o + t*d == a + u*e
        t = ((ax - ox) * ey - (ay - oy) * ex) / den
        u = ((ax - ox) * dy - (ay - oy) * dx) / den
        if 0.0 <= u <= 1.0:
            ln = math.sqrt(ex * ex + ey * ey)
            hits.append((t, ox + t * dx, oy + t * dy, ln, ax, ay, bx, by))
    return hits


def ridge_direction_from_tags(
    tags: dict,
    simplified: np.ndarray,
    ridge_along_direction: bool = False,
    default_direction: tuple[float, float] | None = None,
) -> tuple[float, float]:
    """``RoofWithRidge.ridgeDirectionFromTags`` cascade:
    roof:direction (snapped; ridge orthogonal unless
    ``ridge_along_direction``) -> roof:ridge:direction (snapped, along)
    -> roof:orientation over the min rotated bbox longest side
    (across = right normal), with ``default_direction`` override."""
    ang = snap_direction(tags.get("roof:direction"), simplified)
    if ang is not None:
        v = from_angle(ang)
        return v if ridge_along_direction else right_normal(*v)
    ang = snap_direction(tags.get("roof:ridge:direction"), simplified)
    if ang is not None:
        return from_angle(ang)

    def from_orientation():
        ux, uy = min_obb_longest_dir(simplified)
        if tags.get("roof:orientation") == "across":
            return right_normal(ux, uy)
        return ux, uy

    if default_direction is None:
        return from_orientation()
    if "roof:orientation" in tags:
        rx, ry = from_orientation()
        da, db = default_direction
        dot = max(-1.0, min(1.0, rx * da + ry * db))
        if math.acos(dot) > 0.9 * math.pi:
            return -rx, -ry
        return rx, ry
    return default_direction


def ridge_with_offsets(
    outer: np.ndarray,
    ridge_dir: tuple[float, float],
    rel_off1: float,
    rel_off2: float,
) -> dict:
    """The shared ridge construction of ``RoofWithRidge.java:86-143``
    with the default relativeRidgeLocation (0.5: line through the
    centroid). Returns ridge endpoints, caps, offsets and
    maxDistanceToRidge."""
    simplified = simplify_ring(outer)
    if signed_area2(drop_closing(outer)) == 0.0:
        raise RoofGeometryError("degenerate zero-area outline")
    cx, cy = area_centroid(drop_closing(outer))
    diam = polygon_diameter(drop_closing(outer))
    dx, dy = ridge_dir
    ox, oy = cx - diam * dx, cy - diam * dy
    hits = _line_polygon_hits(simplified, ox, oy, dx, dy)
    if len(hits) < 2:
        raise RoofGeometryError("cannot handle roof geometry")
    hits.sort(key=lambda h: h[0])
    t1, c1x, c1y, len1, a1x, a1y, b1x, b1y = hits[0]
    t2, c2x, c2y, len2, a2x, a2y, b2x, b2y = hits[-1]

    ddx, ddy = c2x - c1x, c2y - c1y
    span = math.sqrt(ddx * ddx + ddy * ddy)
    off1 = min(len1 * rel_off1, 0.4 * span)
    off2 = min(len2 * rel_off2, 0.4 * span)

    if off1 == 0.0 and off2 == 0.0:
        r1x, r1y, r2x, r2y = c1x, c1y, c2x, c2y
    else:
        n1x, n1y = cx - c1x, cy - c1y
        l1 = math.sqrt(n1x * n1x + n1y * n1y)
        r1x, r1y = c1x + n1x / l1 * off1, c1y + n1y / l1 * off1
        n2x, n2y = cx - c2x, cy - c2y
        l2 = math.sqrt(n2x * n2x + n2y * n2y)
        r2x, r2y = c2x + n2x / l2 * off2, c2y + n2y / l2 * off2

    def orient_cap(ax, ay, bx, by):
        # cap points to the right of the ridge (RoofWithRidge.java:136)
        if is_right_of(bx, by, r1x, r1y, r2x, r2y):
            return ax, ay, bx, by
        return bx, by, ax, ay

    cap1 = orient_cap(a1x, a1y, b1x, b1y)
    cap2 = orient_cap(a2x, a2y, b2x, b2y)

    verts = drop_closing(outer)
    max_dist = max(
        dist_point_seg(v[0], v[1], r1x, r1y, r2x, r2y) for v in verts
    )
    return {
        "ridge": (r1x, r1y, r2x, r2y),
        "cap1": cap1,
        "cap2": cap2,
        "off1": off1,
        "off2": off2,
        "max_dist": max_dist,
    }


# ---------------------------------------------------------------------------
# per-shape computation
# ---------------------------------------------------------------------------

def _ridge_height(tags: dict, max_dist: float) -> float | None:
    """``RoofWithRidge.calculatePreliminaryHeight``: roof:height else
    tan(roof:angle) * maxDistanceToRidge."""
    h = parse_measure(tags.get("roof:height"))
    if h is None:
        ang = parse_roof_angle(tags)
        if ang is not None:
            h = math.tan(ang) * max_dist
    return h


def _skillion(outer: np.ndarray, tags: dict, probe) -> dict:
    """``SkillionRoof.java:33-116``."""
    simplified = simplify_ring(outer)
    ang = snap_direction(tags.get("roof:direction"), simplified)
    ridge_line = None
    roof_length = math.nan
    ridge_len = 0.0
    if ang is not None:
        sx, sy = from_angle(ang)
        cx, cy = area_centroid(simplified)
        # segments intersected by the half-line center-1000*slope -> center
        hits = _line_polygon_hits(simplified, cx - 1000.0 * sx, cy - 1000.0 * sy, sx, sy)
        segs = [(h[4], h[5], h[6], h[7]) for h in hits if 0.0 <= h[0] <= 1000.0]
        if segs:
            upper = max(
                segs,
                key=lambda s: dist_point_seg(cx, cy, s[0], s[1], s[2], s[3]),
            )
            uax, uay, ubx, uby = upper
            ulen = math.sqrt((ubx - uax) ** 2 + (uby - uay) ** 2)
            udx, udy = (ubx - uax) / ulen, (uby - uay) / ulen
            dot = max(-1.0, min(1.0, udx * sx + udy * sy))
            if math.acos(dot) < math.pi / 180.0:
                ridge_line = upper
            else:
                diam = polygon_diameter(simplified)
                nx, ny = right_normal(sx, sy)
                ox, oy = nx * diam, ny * diam
                # top point: upper-segment vertex farthest from the
                # center line along the slope; Java Collections.max
                # keeps the FIRST element on ties
                cl_ax, cl_ay = cx - ox, cy - oy
                cl_bx, cl_by = cx + ox, cy + oy
                d_a = dist_point_line(uax, uay, cl_ax, cl_ay, cl_bx, cl_by)
                d_b = dist_point_line(ubx, uby, cl_ax, cl_ay, cl_bx, cl_by)
                tx, ty = (uax, uay) if d_a >= d_b else (ubx, uby)
                ridge_line = (tx - ox, ty - oy, tx + ox, ty + oy)
        if ridge_line is not None:
            verts = drop_closing(outer)
            roof_length = max(
                dist_point_line(v[0], v[1], *ridge_line) for v in verts
            )
    h = parse_measure(tags.get("roof:height"))
    if h is None:
        deg = parse_angle(tags.get("roof:angle"))
        if deg is not None and 0.0 <= deg < 90.0 and ridge_line is not None:
            h = math.tan(math.radians(deg)) * roof_length
    probe_h = None
    if h is not None:
        if ridge_line is None:
            probe_h = h
        else:
            rel = dist_point_line(probe[0], probe[1], *ridge_line) / roof_length
            probe_h = h - rel * h
    if ridge_line is not None:
        rl_dx = ridge_line[2] - ridge_line[0]
        rl_dy = ridge_line[3] - ridge_line[1]
        ridge_len = math.sqrt(rl_dx * rl_dx + rl_dy * rl_dy)
    return {
        "ridge": None,
        "ridge_len": ridge_len,
        "max_dist": 0.0 if math.isnan(roof_length) else roof_length,
        "roof_h": h,
        "probe_h": probe_h,
        "n_inner": 0,
    }


def _pyramidal(outer: np.ndarray, tags: dict, probe) -> dict:
    """``PyramidalRoof.java``: apex at the centroid, a fan of inner
    segments, heightfield interpolation over the fan triangles."""
    verts = drop_closing(outer)
    cx, cy = area_centroid(verts)
    h = parse_measure(tags.get("roof:height"))
    probe_h = None
    if h is not None:
        px, py = probe
        for i in range(len(verts)):
            ax, ay = verts[i]
            bx, by = verts[(i + 1) % len(verts)]
            # barycentric containment (inclusive) in (a, b, apex)
            den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
            if den == 0.0:
                continue
            w1 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / den
            w2 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / den
            w3 = 1.0 - w1 - w2
            eps = 1e-12
            if w1 >= -eps and w2 >= -eps and w3 >= -eps:
                probe_h = w3 * h  # corners a, b at 0, apex at h
                break
    return {
        "ridge": None,
        "ridge_len": 0.0,
        "max_dist": 0.0,
        "roof_h": h,
        "probe_h": probe_h,
        "n_inner": len(verts),
    }


def _hipped_probe_height(geo: dict, h: float, outer: np.ndarray, probe) -> float:
    """``AbstractHippedRoof.getRoofHeightAt_noInterpolation`` incl. the
    triangular end sectors (the reference builds BOTH sector triangles
    from ridge.p1 — mirrored as written)."""
    r1x, r1y, r2x, r2y = geo["ridge"]
    verts = drop_closing(outer)
    max_orth = max(
        dist_point_line(v[0], v[1], r1x, r1y, r2x, r2y) for v in verts
    )

    def plain(px, py):
        rel = dist_point_line(px, py, r1x, r1y, r2x, r2y) / max_orth
        return h - h * rel

    px, py = probe
    c1 = geo["cap1"]
    c2 = geo["cap2"]
    in_sector1 = (
        geo["off1"] > 0
        and is_right_of(px, py, r1x, r1y, c1[2], c1[3])
        and not is_right_of(px, py, r1x, r1y, c1[0], c1[1])
    )
    in_sector2 = (
        geo["off2"] > 0
        and is_right_of(px, py, r2x, r2y, c2[0], c2[1])
        and not is_right_of(px, py, r2x, r2y, c2[2], c2[3])
    )
    cap = c1 if in_sector1 else (c2 if in_sector2 else None)
    if cap is None:
        return plain(px, py)
    ax, ay, az = r1x, r1y, h
    bx, by, bz = cap[0], cap[1], plain(cap[0], cap[1])
    cx_, cy_, cz = cap[2], cap[3], plain(cap[2], cap[3])
    den = (by - cy_) * (ax - cx_) + (cx_ - bx) * (ay - cy_)
    w1 = ((by - cy_) * (px - cx_) + (cx_ - bx) * (py - cy_)) / den
    w2 = ((cy_ - ay) * (px - cx_) + (ax - cx_) * (py - cy_)) / den
    w3 = 1.0 - w1 - w2
    return w1 * az + w2 * bz + w3 * cz


def roof_compute(outer: np.ndarray, tags: dict, probe: tuple[float, float]) -> dict:
    """Dispatch on roof:shape (``Roof.createRoofForShape``; unknown or
    missing -> flat) and compute the roof metrics at ``probe``.

    Returns shape, ridge endpoints (or None), ridge length, the shape's
    slope-extent metric (maxDistanceToRidge for ridge roofs, roofLength
    for skillion), preliminary roof height (None when underivable),
    the height of the roof surface above the base at ``probe``, and the
    number of inner segments."""
    shape = tags.get("roof:shape", "flat")
    if shape == "skillion":
        out = _skillion(outer, tags, probe)
    elif shape == "pyramidal":
        out = _pyramidal(outer, tags, probe)
    elif shape in ("gabled", "hipped"):
        simplified = simplify_ring(outer)
        rdir = ridge_direction_from_tags(tags, simplified)
        rel = 0.0 if shape == "gabled" else 1.0 / 3.0
        geo = ridge_with_offsets(outer, rdir, rel, rel)
        h = _ridge_height(tags, geo["max_dist"])
        r1x, r1y, r2x, r2y = geo["ridge"]
        rdx, rdy = r2x - r1x, r2y - r1y
        ridge_len = math.sqrt(rdx * rdx + rdy * rdy)
        probe_h = None
        if h is not None:
            if shape == "gabled":
                rel_p = (
                    dist_point_seg(probe[0], probe[1], r1x, r1y, r2x, r2y)
                    / geo["max_dist"]
                )
                probe_h = h - h * rel_p
            else:
                probe_h = _hipped_probe_height(geo, h, outer, probe)
        n_inner = 1 if shape == "gabled" else 1 + (2 if geo["off1"] > 0 else 0) + (
            2 if geo["off2"] > 0 else 0
        )
        out = {
            "ridge": geo["ridge"],
            "ridge_len": ridge_len,
            "max_dist": geo["max_dist"],
            "roof_h": h,
            "probe_h": probe_h,
            "n_inner": n_inner,
        }
    else:
        # FlatRoof (the default branch of createRoofForShape)
        out = {
            "ridge": None,
            "ridge_len": 0.0,
            "max_dist": 0.0,
            "roof_h": 0.0,
            "probe_h": 0.0,
            "n_inner": 0,
        }
        shape = "flat"
    out["shape"] = shape
    return out
