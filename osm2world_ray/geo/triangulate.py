"""Ear-clipping triangulation of simple polygons (earcut semantics).

The reference triangulates via earcut4j with poly2tri/JTS fallbacks
(``TriangulationUtil.java:22-91``, ``Earcut4JTriangulationUtil.java``);
this is the standard ear-clipping algorithm (public knowledge; O(n^2)
worst case) on a single simple ring — the rasterization-prep kernel.
Polygons-with-holes triangulate ring-by-ring here (net area = outer
minus holes), matching how the engine's downstream area accounting
consumes them; hole-bridging earcut is a future extension.

Pure numpy/python, no external geometry libs.
"""

from __future__ import annotations

import numpy as np


def _area2(ring: np.ndarray) -> float:
    """Twice the signed area (shoelace; CCW positive)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_triangle(p, a, b, c) -> bool:
    d1 = _cross(p, a, b)
    d2 = _cross(p, b, c)
    d3 = _cross(p, c, a)
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def earcut(ring: np.ndarray) -> np.ndarray:
    """Simple ring (n, 2), no closing duplicate -> (n-2, 3) vertex
    index triangles. Input may wind either way; output triangles are
    CCW in the input's index space."""
    n = len(ring)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    idx = list(range(n))
    if _area2(ring) < 0:  # normalize to CCW
        idx.reverse()
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 2 * n * n:
        guard += 1
        m = len(idx)
        ear_found = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = ring[i0], ring[i1], ring[i2]
            if _cross(a, b, c) <= 0:
                continue  # reflex or degenerate corner
            # no other remaining vertex inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                if _point_in_triangle(ring[j], a, b, c):
                    ok = False
                    break
            if ok:
                tris.append((i0, i1, i2))
                idx.pop(k)
                ear_found = True
                break
        if not ear_found:  # degenerate input; clip blindly to terminate
            tris.append((idx[0], idx[1], idx[2]))
            idx.pop(1)
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return np.array(tris, dtype=np.int64)


def triangle_areas(ring: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Unsigned area per triangle."""
    a = ring[tris[:, 0]]
    b = ring[tris[:, 1]]
    c = ring[tris[:, 2]]
    return 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    )


def _normalize(ring: np.ndarray, ccw: bool) -> np.ndarray:
    return ring if (_area2(ring) > 0) == ccw else ring[::-1]


def earcut_with_holes(outer: np.ndarray, holes: list[np.ndarray]):
    """Polygon-with-holes triangulation via hole bridging + ear clipping.

    The reference triangulates holed polygons through earcut4j
    (``Earcut4JTriangulationUtil.java:27-71``, ``TriangulationUtil.java:
    22-45``), whose hole elimination is the classic Eberly bridge: for
    each hole (rightmost first), connect its maximum-x vertex M to a
    visible vertex of the outer ring found by casting a +x ray from M —
    preferring the ray-hit edge's endpoint, demoted to the angle-minimal
    reflex vertex inside the (M, I, P) triangle when one occludes it —
    then splice the hole into the outer ring with duplicated bridge
    vertices. Returns (verts, tris): the merged ring and (n-2, 3)
    triangle indices; total triangle area == outer area - hole areas.
    """
    ring = [tuple(p) for p in _normalize(np.asarray(outer, dtype=np.float64), True)]
    hs = [_normalize(np.asarray(h, dtype=np.float64), False) for h in holes]
    hs.sort(key=lambda h: -float(h[:, 0].max()))
    for h in hs:
        hv = [tuple(p) for p in h]
        mi = max(range(len(hv)), key=lambda i: (hv[i][0], hv[i][1]))
        mx, my = hv[mi]
        # +x ray to the outer ring: closest crossing edge
        best_x, best_edge = np.inf, None
        n = len(ring)
        for i in range(n):
            ax, ay = ring[i]
            bx, by = ring[(i + 1) % n]
            if (ay > my) == (by > my) or ay == by:
                continue
            xint = ax + (my - ay) / (by - ay) * (bx - ax)
            if mx <= xint < best_x:
                best_x, best_edge = xint, i
        if best_edge is None:
            # hole outside the ring (invalid input): skip it
            continue
        i = best_edge
        a, b = ring[i], ring[(i + 1) % len(ring)]
        p_idx = i if a[0] > b[0] else (i + 1) % len(ring)
        px, py = ring[p_idx]
        # occlusion check: reflex ring vertices inside triangle (M,I,P)
        ix, iy = best_x, my
        cand, cand_key = None, None
        for j in range(len(ring)):
            q = ring[j]
            if q in ((mx, my), (ix, iy), (px, py)):
                continue
            if _point_in_triangle(q, (mx, my),
                                  (ix, iy) if py > my else (px, py),
                                  (px, py) if py > my else (ix, iy)):
                prev, nxt = ring[j - 1], ring[(j + 1) % len(ring)]
                if _cross(prev, q, nxt) < 0:  # reflex in CCW ring
                    dx, dy = q[0] - mx, q[1] - my
                    if dx <= 0:
                        continue
                    key = (abs(dy) / dx, dx * dx + dy * dy)
                    if cand is None or key < cand_key:
                        cand, cand_key = j, key
        if cand is not None:
            p_idx = cand
        # splice: ... P, M, hole..., M, P ...
        hole_cycle = hv[mi:] + hv[:mi]
        ring = ring[: p_idx + 1] + hole_cycle + [hole_cycle[0], ring[p_idx]] + ring[p_idx + 1 :]
    verts = np.asarray(ring, dtype=np.float64)
    return verts, earcut_ring_noccw(verts)


def earcut_ring_noccw(ring: np.ndarray) -> np.ndarray:
    """Ear clipping that preserves the given (already CCW, possibly
    bridge-duplicated) vertex order; duplicate bridge vertices are
    excluded from the in-ear blocking test by coordinate equality."""
    n = len(ring)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    idx = list(range(n))
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 2 * n * n:
        guard += 1
        m = len(idx)
        ear_found = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = ring[i0], ring[i1], ring[i2]
            if _cross(a, b, c) <= 0:
                continue
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                p = ring[j]
                if (
                    (p[0] == a[0] and p[1] == a[1])
                    or (p[0] == b[0] and p[1] == b[1])
                    or (p[0] == c[0] and p[1] == c[1])
                ):
                    continue  # bridge duplicate of an ear corner
                if _point_in_triangle(p, a, b, c):
                    ok = False
                    break
            if ok:
                tris.append((i0, i1, i2))
                idx.pop(k)
                ear_found = True
                break
        if not ear_found:
            tris.append((idx[0], idx[1], idx[2]))
            idx.pop(1)
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return np.array(tris, dtype=np.int64)
