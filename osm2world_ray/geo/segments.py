"""Segment-intersection kernels, vectorized over candidate pairs.

Semantics follow the reference's ``GeometryUtil``
(``core/src/main/java/org/osm2world/math/algorithms/GeometryUtil.java:222-278``):
``getLineSegmentIntersection`` returns the intersection point of two
proper (non-collinear) crossing segments; the *true* variant excludes
intersections at shared endpoints — the rule used by the overlap
self-join (``OSMToMapDataConverter.java:486-509``), which also skips
segment pairs that are graph-connected.
"""

from __future__ import annotations

import numpy as np


def segment_intersection(p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y, true_only: bool = True):
    """Pairwise segment x segment intersection.

    All args are equal-length arrays: pair i tests segment (p1,p2)[i]
    against (q1,q2)[i]. Returns ``(mask, ix, iy)``: whether the pair
    properly intersects, and the intersection point. Collinear overlaps
    return False (the reference treats those as SHARE_SEGMENT, handled
    separately). With ``true_only`` intersections at a shared endpoint
    are excluded (strict interior crossing on both segments).
    """
    p1x = np.asarray(p1x, dtype=np.float64)
    p1y = np.asarray(p1y, dtype=np.float64)
    rx = np.asarray(p2x, dtype=np.float64) - p1x
    ry = np.asarray(p2y, dtype=np.float64) - p1y
    q1x = np.asarray(q1x, dtype=np.float64)
    q1y = np.asarray(q1y, dtype=np.float64)
    sx = np.asarray(q2x, dtype=np.float64) - q1x
    sy = np.asarray(q2y, dtype=np.float64) - q1y

    denom = rx * sy - ry * sx
    dqx = q1x - p1x
    dqy = q1y - p1y
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (dqx * sy - dqy * sx) / denom
        u = (dqx * ry - dqy * rx) / denom
    nondegenerate = denom != 0
    if true_only:
        mask = nondegenerate & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    else:
        mask = nondegenerate & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    with np.errstate(invalid="ignore"):
        ix = np.where(mask, p1x + t * rx, np.nan)
        iy = np.where(mask, p1y + t * ry, np.nan)
    return mask, ix, iy


def is_right_of(px, py, l1x, l1y, l2x, l2y):
    """Vectorized ``GeometryUtil.isRightOf`` (``GeometryUtil.java:283-287``):
    p strictly right of the line l1->l2 (y here = the reference's z)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return 0 > (py - l1y) * (l2x - l1x) - (px - l1x) * (l2y - l1y)


def is_between(px, py, l1x, l1y, l2x, l2y):
    """Vectorized ``GeometryUtil.isBetween`` (``GeometryUtil.java:297-306``):
    l1-l2 is the strictly longest side of the triangle."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    d_l1l2 = (l2x - l1x) ** 2 + (l2y - l1y) ** 2
    d_pl1 = (px - l1x) ** 2 + (py - l1y) ** 2
    d_pl2 = (px - l2x) ** 2 + (py - l2y) ** 2
    return (d_l1l2 > d_pl1) & (d_l1l2 > d_pl2)


def distance_from_line(px, py, v1x, v1y, v2x, v2y):
    """Vectorized ``GeometryUtil.distanceFromLine``
    (``GeometryUtil.java:335-343``): point to INFINITE line, via the
    same projection-length formula (including its max-with-0 guard)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    tvx = v2x - v1x
    tvy = v2y - v1y
    tpx = px - v1x
    tpy = py - v1y
    dot = tpx * tvx + tpy * tvy
    proj_sq = dot * dot / (tvx * tvx + tvy * tvy)
    length_sq = np.maximum(tpx * tpx + tpy * tpy - proj_sq, 0.0)
    return np.sqrt(length_sq)


def distance_from_line_segment(px, py, v1x, v1y, v2x, v2y):
    """Vectorized ``GeometryUtil.distanceFromLineSegment``
    (``GeometryUtil.java:348-351``; reference delegates to JTS
    ``LineSegment.distance``): clamp the projection parameter to
    [0, 1], then point distance."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    tvx = v2x - v1x
    tvy = v2y - v1y
    denom = tvx * tvx + tvy * tvy
    t = np.where(
        denom > 0, ((px - v1x) * tvx + (py - v1y) * tvy) / np.maximum(denom, 1e-300), 0.0
    )
    t = np.clip(t, 0.0, 1.0)
    fx = v1x + t * tvx
    fy = v1y + t * tvy
    return np.hypot(px - fx, py - fy)


def project_perpendicular(px, py, v1x, v1y, v2x, v2y):
    """Vectorized ``GeometryUtil.projectPerpendicular``
    (``GeometryUtil.java:354-358``): foot of the perpendicular on the
    infinite line (no clamping)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    tvx = v2x - v1x
    tvy = v2y - v1y
    denom = tvx * tvx + tvy * tvy
    t = ((px - v1x) * tvx + (py - v1y) * tvy) / denom
    return v1x + t * tvx, v1y + t * tvy


def bbox_intersects(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Vectorized closed-interval bbox overlap test."""
    return (
        (np.asarray(aminx) <= np.asarray(bmaxx))
        & (np.asarray(amaxx) >= np.asarray(bminx))
        & (np.asarray(aminy) <= np.asarray(bmaxy))
        & (np.asarray(amaxy) >= np.asarray(bminy))
    )
