"""Clip-to-bounds: Sutherland–Hodgman polygon clip + center-drop filter.

Semantics follow the reference's ``ClipToBounds`` mesh-processing step
(``core/src/main/java/org/osm2world/scene/mesh/MeshStore.java:577-768``):
either *drop* geometry whose center lies outside the bounds
(``splitTriangles=false``, ``:591-599``), or *split* it successively
against the CCW boundary edges keeping the left side (``:746-766``).
This is the tile-border-straddling rule: an element fanned out to every
overlapped tile is clipped exactly to that tile's rectangle inside the
tile's partition (``GltfOutput.java:439``,
``FrontendPbfOutput.java:716-725``).
"""

from __future__ import annotations

import numpy as np


def clip_ring_to_rect(
    ring: np.ndarray, minx: float, miny: float, maxx: float, maxy: float
) -> np.ndarray:
    """Sutherland–Hodgman clip of one ring against an axis-aligned rect.

    The rect boundary is traversed CCW and the left side kept at each
    edge (the reference's keep-left rule). Returns an (m, 2) array —
    possibly empty — without a duplicated closing vertex.
    """
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    # each clip edge as (inside predicate, intersection solver)
    for axis, bound, keep_le in (
        (0, minx, False),  # x >= minx
        (1, miny, False),  # y >= miny
        (0, maxx, True),   # x <= maxx
        (1, maxy, True),   # y <= maxy
    ):
        if len(pts) == 0:
            break
        coord = pts[:, axis]
        inside = coord <= bound if keep_le else coord >= bound
        nxt = np.roll(np.arange(len(pts)), -1)
        out = []
        for i in range(len(pts)):
            j = nxt[i]
            if inside[i]:
                out.append(pts[i])
                if not inside[j]:
                    out.append(_isect_axis(pts[i], pts[j], axis, bound))
            elif inside[j]:
                out.append(_isect_axis(pts[i], pts[j], axis, bound))
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    return pts


def clip_ring_to_convex(ring: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of one ring against a CONVEX clip
    polygon — the boolean-intersection kernel (the CAG ``intersect``
    analogue, ``CAGUtil.java:37-41``; JTS there, pure numpy here).

    ``clip_ring`` must be convex; winding is normalized to CCW
    internally, and the subject is clipped keeping the left side of
    each clip edge (the same keep-left rule as the rect case). Returns
    the intersection ring (possibly empty), no closing duplicate.
    """
    pts = np.asarray(ring, dtype=np.float64)
    clip = np.asarray(clip_ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    if len(clip) and np.array_equal(clip[0], clip[-1]):
        clip = clip[:-1]
    # normalize clip winding to CCW (shoelace)
    x, y = clip[:, 0], clip[:, 1]
    if np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y) < 0:
        clip = clip[::-1]
    for k in range(len(clip)):
        if len(pts) == 0:
            break
        a = clip[k]
        b = clip[(k + 1) % len(clip)]
        ex, ey = b[0] - a[0], b[1] - a[1]
        side = (pts[:, 0] - a[0]) * ey - (pts[:, 1] - a[1]) * ex
        inside = side <= 0  # left of (or on) the CCW edge
        out = []
        n = len(pts)
        for i in range(n):
            j = (i + 1) % n
            if inside[i]:
                out.append(pts[i])
                if not inside[j]:
                    out.append(_isect_edge(pts[i], pts[j], side[i], side[j]))
            elif inside[j]:
                out.append(_isect_edge(pts[i], pts[j], side[i], side[j]))
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    return pts


def _isect_edge(p: np.ndarray, q: np.ndarray, sp: float, sq: float) -> np.ndarray:
    t = sp / (sp - sq)
    return p + t * (q - p)


def _isect_axis(p: np.ndarray, q: np.ndarray, axis: int, bound: float) -> np.ndarray:
    t = (bound - p[axis]) / (q[axis] - p[axis])
    r = p + t * (q - p)
    r[axis] = bound  # exact on the clip line
    return r


def centers_in_rect(
    cx: np.ndarray, cy: np.ndarray, minx, miny, maxx, maxy
) -> np.ndarray:
    """Vectorized center-drop mask (splitTriangles=false,
    MeshStore.java:591-599): keep iff the centroid is inside the rect.
    Half-open [min, max) on both axes so tiles sharing an edge never
    double-claim an element."""
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)
    return (cx >= minx) & (cx < maxx) & (cy >= miny) & (cy < maxy)


def clip_segment_to_rect(
    x1, y1, x2, y2, minx: float, miny: float, maxx: float, maxy: float
):
    """Vectorized Liang–Barsky segment clip against a rect.

    Returns (keep_mask, cx1, cy1, cx2, cy2): per input segment, whether
    any part lies inside, and the clipped endpoints.
    """
    x1 = np.asarray(x1, dtype=np.float64).copy()
    y1 = np.asarray(y1, dtype=np.float64).copy()
    x2 = np.asarray(x2, dtype=np.float64).copy()
    y2 = np.asarray(y2, dtype=np.float64).copy()
    dx = x2 - x1
    dy = y2 - y1
    t0 = np.zeros_like(x1)
    t1 = np.ones_like(x1)
    keep = np.ones(len(x1), dtype=bool)
    for p, q in (
        (-dx, x1 - minx),
        (dx, maxx - x1),
        (-dy, y1 - miny),
        (dy, maxy - y1),
    ):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = q / p
        par_out = (p == 0) & (q < 0)
        keep &= ~par_out
        ent = p < 0
        ext = p > 0
        t0 = np.where(ent, np.maximum(t0, r), t0)
        t1 = np.where(ext, np.minimum(t1, r), t1)
    keep &= t0 <= t1
    cx1 = x1 + t0 * dx
    cy1 = y1 + t0 * dy
    cx2 = x1 + t1 * dx
    cy2 = y1 + t1 * dy
    return keep, cx1, cy1, cx2, cy2
