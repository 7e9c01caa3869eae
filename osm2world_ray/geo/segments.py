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


def bbox_intersects(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Vectorized closed-interval bbox overlap test."""
    return (
        (np.asarray(aminx) <= np.asarray(bmaxx))
        & (np.asarray(amaxx) >= np.asarray(bminx))
        & (np.asarray(aminy) <= np.asarray(bmaxy))
        & (np.asarray(amaxy) >= np.asarray(bminy))
    )
